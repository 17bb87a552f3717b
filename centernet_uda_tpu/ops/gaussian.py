"""Gaussian target encoding for CenterNet heatmaps.

Host-side numpy twins of the reference target helpers
(``utils/image.py``: ``gaussian_radius`` :8-28, ``gaussian2D`` :31-37,
``draw_umich_gaussian`` :40-57) used by the data pipeline, plus a fully
vectorized on-device ``splat_gaussians`` (scatter-free max-composition) so
target encoding can run inside the jitted train step and off the host
critical path — the reference draws gaussians object-by-object in the
DataLoader worker (datasets/coco.py:203-209).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_radius(det_size, min_overlap: float = 0.7) -> float:
    """CornerNet's three-case minimum gaussian radius (utils/image.py:8-28)."""
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = math.sqrt(max(b1 ** 2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2.0

    a2 = 4.0
    b2 = 2.0 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = math.sqrt(max(b2 ** 2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2.0

    a3 = 4.0 * min_overlap
    b3 = -2.0 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = math.sqrt(max(b3 ** 2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2.0
    return min(r1, r2, r3)


def gaussian_2d(shape, sigma: float = 1.0) -> np.ndarray:
    """Unnormalized 2D gaussian patch (utils/image.py:31-37)."""
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0) -> np.ndarray:
    """Max-composite a truncated gaussian into ``heatmap`` in place.

    Host-side twin of ``draw_umich_gaussian`` (utils/image.py:40-57): the
    patch has diameter ``2*radius+1`` and ``sigma = diameter / 6``; edges are
    clipped at the heatmap border.
    """
    diameter = 2 * radius + 1
    gaussian = gaussian_2d((diameter, diameter), sigma=diameter / 6)

    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]

    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)

    masked_heatmap = heatmap[y - top : y + bottom, x - left : x + right]
    masked_gaussian = gaussian[
        radius - top : radius + bottom, radius - left : radius + right
    ]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def draw_dense_reg(regmap: np.ndarray, heatmap: np.ndarray, center, value,
                   radius: int, is_offset: bool = False) -> np.ndarray:
    """Dense regression-map drawing (utils/image.py:60-92; present in the
    reference but unused by its datasets — kept for API parity)."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d((diameter, diameter), sigma=diameter / 6)
    value = np.array(value, dtype=np.float32).reshape(-1, 1, 1)
    dim = value.shape[0]
    reg = np.ones((dim, diameter * 2 + 1, diameter * 2 + 1),
                  dtype=np.float32) * value
    if is_offset and dim == 2:
        delta = np.arange(diameter * 2 + 1) - radius
        reg[0] = reg[0] - delta.reshape(1, -1)
        reg[1] = reg[1] - delta.reshape(-1, 1)

    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)

    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_regmap = regmap[:, y - top:y + bottom, x - left:x + right]
    masked_gaussian = gaussian[radius - top:radius + bottom,
                               radius - left:radius + right]
    masked_reg = reg[:, radius - top:radius + bottom,
                     radius - left:radius + right]
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        idx = (masked_gaussian >= masked_heatmap).reshape(
            1, masked_gaussian.shape[0], masked_gaussian.shape[1])
        masked_regmap = (1 - idx) * masked_regmap + idx * masked_reg
    regmap[:, y - top:y + bottom, x - left:x + right] = masked_regmap
    return regmap


def draw_msra_gaussian(heatmap: np.ndarray, center, sigma: float) -> np.ndarray:
    """MSRA-style additive-window gaussian (utils/image.py:95-116; unused by
    the reference datasets — kept for API parity)."""
    tmp_size = sigma * 3
    mu_x = int(center[0] + 0.5)
    mu_y = int(center[1] + 0.5)
    w, h = heatmap.shape[0], heatmap.shape[1]
    ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
    br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
    if ul[0] >= h or ul[1] >= w or br[0] < 0 or br[1] < 0:
        return heatmap
    size = 2 * tmp_size + 1
    x = np.arange(0, size, 1, np.float32)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma ** 2))
    g_x = max(0, -ul[0]), min(br[0], h) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], w) - ul[1]
    img_x = max(0, ul[0]), min(br[0], h)
    img_y = max(0, ul[1]), min(br[1], w)
    heatmap[img_y[0]:img_y[1], img_x[0]:img_x[1]] = np.maximum(
        heatmap[img_y[0]:img_y[1], img_x[0]:img_x[1]],
        g[g_y[0]:g_y[1], g_x[0]:g_x[1]])
    return heatmap


def splat_gaussians(
    centers: jax.Array,
    radii: jax.Array,
    classes: jax.Array,
    mask: jax.Array,
    height: int,
    width: int,
    num_classes: int,
) -> jax.Array:
    """On-device gaussian heatmap splatting (single image).

    Vectorized max-composition over all objects at once — no scatter, no
    per-object Python loop — producing the same heatmap as repeated
    ``draw_gaussian`` calls. Inputs are padded to a static max-detections
    length ``K``:

    - ``centers``: (K, 2) integer (x, y) centers (the reference truncates to
      int before drawing, datasets/coco.py:208-209).
    - ``radii``: (K,) integer radii.
    - ``classes``: (K,) int class ids.
    - ``mask``: (K,) 1.0 for valid objects.

    Returns an (H, W, num_classes) float32 heatmap. ``vmap`` over the batch
    for (B, H, W, C). The per-object gaussian is truncated to the
    ``(2r+1)^2`` box and floored at numpy ``eps * max`` exactly like
    ``gaussian2D`` (utils/image.py:36) so host and device targets match.
    """
    kmax = centers.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)

    cx = centers[:, 0].astype(jnp.int32)[:, None, None]  # (K,1,1)
    cy = centers[:, 1].astype(jnp.int32)[:, None, None]
    r = radii.astype(jnp.float32)[:, None, None]

    dx = (xs[None] - cx).astype(jnp.float32)  # (K,H,W)
    dy = (ys[None] - cy).astype(jnp.float32)

    diameter = 2.0 * r + 1.0
    sigma = diameter / 6.0
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))

    inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    # gaussian2D zeroes values below eps * max; the patch max is 1 at center.
    eps = jnp.float32(np.finfo(np.float64).eps)
    keep = inside & (g >= eps) & (mask[:, None, None] > 0)
    g = jnp.where(keep, g, 0.0)

    onehot = jax.nn.one_hot(classes.astype(jnp.int32), num_classes, dtype=g.dtype)
    # (K,H,W,1) * (K,1,1,C) -> max over K -> (H,W,C)
    contrib = g[..., None] * onehot[:, None, None, :]
    return jnp.max(contrib, axis=0) if kmax > 0 else jnp.zeros(
        (height, width, num_classes), jnp.float32
    )
