"""Fused CenterNet detection decode for TPU.

Re-implements the semantics of the reference post-processing
(``backends/decode.py``: ``_nms`` :6-13, ``_topk`` :16-32,
``decode_detection`` :35-76) as one jittable XLA function over NHWC head
tensors. Peak suppression is a 3x3 max-pool window reduction (fuses with the
surrounding elementwise ops), top-k is ``jax.lax.top_k`` with the reference's
two-stage per-class-then-global selection, and the final detections are
gathered with static shapes so the whole decode compiles to a single fused
program (the "decode p50 latency" north-star component).

Layout notes vs the reference:
- heads are NHWC: ``hm`` (B, H, W, num_classes), ``wh`` (B, H, W, 2|3),
  ``reg`` (B, H, W, 2), ``kps`` (B, H, W, 2*P).
- ``hm`` must already be sigmoided by the caller. The reference relies on
  ``DetectionLoss`` mutating the output dict in place
  (losses/centernet.py:34) before ``decode_detection`` consumes it
  (uda/base.py:76); the functional rebuild makes that dataflow explicit —
  pass ``apply_sigmoid=True`` to do it here.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from centernet_uda_tpu.ops.tensor import gather_features, sigmoid_clamped


def nms_peaks(heat: jax.Array, kernel: int = 3) -> jax.Array:
    """Keep only local maxima of the heatmap (NHWC).

    Matches ``_nms`` (backends/decode.py:6-13): a score survives iff it
    equals the max of its ``kernel x kernel`` neighbourhood. The reference
    computes ``keep = 1 - ceil(hmax - heat)`` (an ONNX-friendly equality
    test); for ``hmax >= heat`` (always true) that is exactly
    ``hmax == heat``, which is what we lower — XLA fuses the compare+select
    into the reduce-window epilogue.
    """
    pad = (kernel - 1) // 2
    hmax = lax.reduce_window(
        heat,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return jnp.where(hmax == heat, heat, jnp.zeros_like(heat))


def top_k_peaks(
    scores: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Two-stage top-k over an NHWC heatmap.

    Matches ``_topk`` (backends/decode.py:16-32): per-class top-k over the
    spatial plane, then a global top-k over the ``num_classes * k``
    candidates, recovering the class index as ``flat_idx // k``.

    Returns ``(score, inds, classes, ys, xs)`` each of shape (B, k); ``inds``
    are flat ``y * W + x`` spatial indices.
    """
    b, h, w, c = scores.shape
    assert k <= h * w, (
        f"top-k {k} exceeds the {h}x{w} heatmap; lower max_detections or "
        "raise the input size"
    )
    # (B, C, H*W): class-major flattening as in the reference's NCHW view.
    per_class = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    topk_scores, topk_inds = lax.top_k(per_class, k)  # (B, C, k)

    topk_ys = (topk_inds // w).astype(jnp.float32)
    topk_xs = (topk_inds % w).astype(jnp.float32)

    topk_score, topk_ind = lax.top_k(topk_scores.reshape(b, c * k), k)  # (B, k)
    topk_cls = (topk_ind // k).astype(jnp.int32)

    flat = lambda x: jnp.take_along_axis(x.reshape(b, c * k), topk_ind, axis=1)
    inds = flat(topk_inds)
    ys = flat(topk_ys)
    xs = flat(topk_xs)
    return topk_score, inds, topk_cls, ys, xs


def decode_detections(
    hm: jax.Array,
    wh: jax.Array,
    reg: Optional[jax.Array] = None,
    kps: Optional[jax.Array] = None,
    k: int = 100,
    rotated: bool = False,
    nms_size: int = 3,
    apply_sigmoid: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Decode CenterNet heads into top-k detections.

    Re-implements ``decode_detection`` (backends/decode.py:35-76) with NHWC
    inputs. Output detections are (B, k, 6) rows
    ``[x1, y1, x2, y2, score, class]`` in heatmap coordinates, or (B, k, 7)
    ``[cx, cy, w, h, angle_deg, score, class]`` when ``rotated`` (angle is
    ``sigmoid(raw) * 360 - 180`` as at backends/decode.py:65). With ``kps``
    returns ``(detections, keypoints)`` where keypoints are (B, k, P, 2)
    center-relative offsets shifted to absolute positions
    (backends/decode.py:69-74).
    """
    if apply_sigmoid:
        hm = sigmoid_clamped(hm)

    heat = nms_peaks(hm, nms_size)
    scores, inds, classes, ys, xs = top_k_peaks(heat, k)

    if reg is not None:
        b, h, w, _ = reg.shape
        reg_k = gather_features(reg.reshape(b, h * w, -1), inds)  # (B, k, 2)
        xs = xs[..., None] + reg_k[..., 0:1]
        ys = ys[..., None] + reg_k[..., 1:2]
    else:
        xs = xs[..., None] + 0.5
        ys = ys[..., None] + 0.5

    b, h, w, wc = wh.shape
    wh_k = gather_features(wh.reshape(b, h * w, wc), inds)  # (B, k, 2|3)
    classes_f = classes[..., None].astype(jnp.float32)
    scores_k = scores[..., None]

    if not rotated:
        bboxes = jnp.concatenate(
            [
                xs - wh_k[..., 0:1] / 2.0,
                ys - wh_k[..., 1:2] / 2.0,
                xs + wh_k[..., 0:1] / 2.0,
                ys + wh_k[..., 1:2] / 2.0,
            ],
            axis=2,
        )
    else:
        angle = sigmoid_clamped(wh_k[..., 2:3]) * 360.0 - 180.0
        bboxes = jnp.concatenate(
            [xs, ys, wh_k[..., 0:1], wh_k[..., 1:2], angle], axis=2
        )

    detections = jnp.concatenate([bboxes, scores_k, classes_f], axis=2)

    if kps is not None:
        b, h, w, kc = kps.shape
        kps_k = gather_features(kps.reshape(b, h * w, kc), inds)
        kps_k = kps_k.reshape(b, k, kc // 2, 2)
        kps_k = kps_k.at[..., 0].add(xs)
        kps_k = kps_k.at[..., 1].add(ys)
        return detections, kps_k

    return detections
