"""Deformable PS-RoI pooling (DCNv2Pooling / DCNPooling).

TPU twin of the reference's pooling half of the DCNv2 extension
(``libs/DCNv2/dcn_v2.py:130-303``, CUDA kernel
``DeformablePSROIPoolForwardKernelCuda``,
src/cuda/dcn_v2_psroi_pooling_cuda.cu:59-146). Not used by any reference
backend or experiment config (SURVEY §2.3) — provided for API completeness;
implemented as vectorized XLA (gathers over a fixed sample grid) with
autodiff gradients.

Layouts: ``x`` NHWC (B, H, W, C) with ``C == output_dim * group_size**2``;
``rois`` (N, 5) rows ``[batch_index, x1, y1, x2, y2]`` in input-image
coordinates; ``trans`` (N, 2 * num_classes, part_size, part_size) offset
field (torch layout), ignored when ``no_trans``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear(plane_flat: jax.Array, h: int, w: int, py, px):
    """plane_flat (H*W, C'); py/px (...,) clamped coords -> (..., C')."""
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    dy = (py - y0)[..., None]
    dx = (px - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def take(yy, xx):
        return plane_flat[yy * w + xx]

    return (take(y0, x0) * (1 - dy) * (1 - dx)
            + take(y0, x1) * (1 - dy) * dx
            + take(y1, x0) * dy * (1 - dx)
            + take(y1, x1) * dy * dx)


def dcn_v2_pooling(
    x: jax.Array,
    rois: jax.Array,
    trans: Optional[jax.Array],
    spatial_scale: float,
    pooled_size: int,
    output_dim: int,
    no_trans: bool,
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jax.Array:
    """Deformable position-sensitive RoI average pooling.

    Returns (N, pooled_size, pooled_size, output_dim). Matches the CUDA
    kernel semantics: rounded RoI corners scaled by ``spatial_scale`` with
    the -0.5 center shift, minimum 0.1 extent, per-bin ``sample_per_part^2``
    bilinear samples averaged over in-bounds samples, position-sensitive
    channel selection ``(ctop*G + gh)*G + gw``, and per-part translation
    offsets scaled by ``trans_std``.
    """
    b, h, w, c = x.shape
    n = rois.shape[0]
    g = group_size
    ps = pooled_size
    sp = sample_per_part
    part = pooled_size if part_size is None else part_size
    assert c == output_dim * g * g, (c, output_dim, g)
    num_classes = 1 if no_trans else trans.shape[1] // 2
    channels_each_class = max(output_dim // num_classes, 1)

    rois = rois.astype(jnp.float32)
    batch_idx = rois[:, 0].astype(jnp.int32)  # (N,)
    start_w = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    start_h = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    end_w = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    end_h = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(end_w - start_w, 0.1)
    roi_h = jnp.maximum(end_h - start_h, 0.1)
    bin_w = roi_w / ps
    bin_h = roi_h / ps
    sub_w = bin_w / sp
    sub_h = bin_h / sp

    ph = jnp.arange(ps)
    pw = jnp.arange(ps)
    part_h = jnp.floor(ph / ps * part).astype(jnp.int32)  # (PS,)
    part_w = jnp.floor(pw / ps * part).astype(jnp.int32)

    if no_trans:
        trans_x = jnp.zeros((n, output_dim, ps, ps), jnp.float32)
        trans_y = jnp.zeros((n, output_dim, ps, ps), jnp.float32)
    else:
        trans = trans.astype(jnp.float32)  # (N, 2*num_classes, part, part)
        cls_of_ctop = (jnp.arange(output_dim) // channels_each_class
                       ).astype(jnp.int32)
        tx = trans[:, cls_of_ctop * 2][:, :, part_h][:, :, :, part_w]
        ty = trans[:, cls_of_ctop * 2 + 1][:, :, part_h][:, :, :, part_w]
        trans_x = tx * trans_std  # (N, output_dim, PS, PS)
        trans_y = ty * trans_std

    # sample coordinates (N, output_dim, PS, PS, SP, SP)
    wstart = (pw[None, :] * bin_w[:, None] + start_w[:, None])  # (N, PS)
    hstart = (ph[None, :] * bin_h[:, None] + start_h[:, None])
    wstart = wstart[:, None, None, :] + trans_x * roi_w[:, None, None, None]
    hstart = hstart[:, None, :, None] + trans_y * roi_h[:, None, None, None]

    iw = jnp.arange(sp)
    samp_w = (wstart[..., None, None]
              + iw[None, None, None, None, None, :] * sub_w[:, None, None, None, None, None])
    samp_h = (hstart[..., None, None]
              + iw[None, None, None, None, :, None] * sub_h[:, None, None, None, None, None])

    in_bounds = ((samp_w >= -0.5) & (samp_w <= w - 0.5)
                 & (samp_h >= -0.5) & (samp_h <= h - 0.5))
    cw = jnp.clip(samp_w, 0.0, w - 1.0)
    ch = jnp.clip(samp_h, 0.0, h - 1.0)

    # position-sensitive channel per (ctop, ph, pw)
    gw = jnp.clip(jnp.floor(pw * g / ps).astype(jnp.int32), 0, g - 1)
    gh = jnp.clip(jnp.floor(ph * g / ps).astype(jnp.int32), 0, g - 1)
    ctop = jnp.arange(output_dim)
    chan = ((ctop[:, None, None] * g + gh[None, :, None]) * g
            + gw[None, None, :])  # (output_dim, PS, PS)

    x_flat = x.reshape(b, h * w, c)

    def pool_one(bi, ch_coords, cw_coords, valid):
        # ch/cw (output_dim, PS, PS, SP, SP)
        vals = _bilinear(x_flat[bi], h, w, ch_coords, cw_coords)  # (..., C)
        # select the position-sensitive channel
        vals = jnp.take_along_axis(
            vals, chan[..., None, None, None].astype(jnp.int32), axis=-1
        )[..., 0]
        vals = jnp.where(valid, vals, 0.0)
        cnt = valid.sum(axis=(-1, -2))
        total = vals.sum(axis=(-1, -2))
        return jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)

    out = jax.vmap(pool_one)(batch_idx, ch, cw, in_bounds)
    # (N, output_dim, PS, PS) -> NHWC-style (N, PS, PS, output_dim)
    return out.transpose(0, 2, 3, 1)


class DCNv2Pooling(nn.Module):
    """Module twin of ``dcn_v2.py:187-221`` (explicit trans input)."""

    spatial_scale: float
    pooled_size: int
    output_dim: int
    no_trans: bool
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0

    @nn.compact
    def __call__(self, x, rois, trans=None):
        assert x.shape[-1] == self.output_dim * self.group_size ** 2
        return dcn_v2_pooling(
            x, rois, None if self.no_trans else trans,
            self.spatial_scale, self.pooled_size, self.output_dim,
            self.no_trans, self.group_size, self.part_size,
            self.sample_per_part, self.trans_std,
        )


class DCNPooling(nn.Module):
    """Module twin of ``dcn_v2.py:224-303``: a no-trans pooling pass feeds a
    small FC head predicting per-part offsets and a modulation mask for a
    second, deformable pass."""

    spatial_scale: float
    pooled_size: int
    output_dim: int
    no_trans: bool
    group_size: int = 1
    part_size: Optional[int] = None
    sample_per_part: int = 4
    trans_std: float = 0.0
    deform_fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rois):
        n = rois.shape[0]
        ps = self.pooled_size

        base = dcn_v2_pooling(
            x, rois, None, self.spatial_scale, ps, self.output_dim, True,
            self.group_size, self.part_size, self.sample_per_part,
            self.trans_std,
        )
        if self.no_trans:
            return base

        feat = base.reshape(n, -1)
        z = nn.Dense(self.deform_fc_dim, dtype=self.dtype, name="fc1")(feat)
        z = nn.relu(z)
        z = nn.Dense(self.deform_fc_dim, dtype=self.dtype, name="fc2")(z)
        z = nn.relu(z)
        z = nn.Dense(ps * ps * 3, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="fc3")(z)
        z = z.reshape(n, 3, ps, ps)
        offset = z[:, :2]  # (N, 2, PS, PS)
        mask = jax.nn.sigmoid(z[:, 2:3])  # (N, 1, PS, PS)

        pooled = dcn_v2_pooling(
            x, rois, offset, self.spatial_scale, ps, self.output_dim, False,
            self.group_size, self.part_size, self.sample_per_part,
            self.trans_std,
        )
        return pooled * mask.transpose(0, 2, 3, 1)
