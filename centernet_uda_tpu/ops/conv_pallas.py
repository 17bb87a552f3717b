"""Pallas stride-1 convolution for the space-to-depth stem.

Why this exists: the packed DLA stem runs three small stride-1 convs on a
256x256 grid (base 5x5 Cin=12->64, level0 3x3 64->64, level1 2x2 64->32 —
models/dla.py:320-350). XLA lowers the Cin=12 base conv with a
batch-on-lanes layout (bf16[16,256,256,12]{0,3,2,1}) that runs the MXU at
~8.5% utilization — profiled at 2.4 ms forward + 1.7 ms dW of a ~110 ms
DLA-34 train step, with the level0/level1 convs adding ~5 ms more; no XLA
reformulation measured better (BASELINE.md round 4). The reference runs
the same math as plain NCHW torch convs (backends/dla.py:236-247).

The kernel keeps channels on sublanes and the image width on lanes (the
layout the DCN lanes kernels established, ops/dcn_pallas.py):

  forward   z_tj = src_cat @ W_tj           one rank3xrank2 MXU matmul per
            horizontal tap, contracting K = kh*Cin_pad sublanes at once
            (Cin=12 alone would run K at ~9% — concatenating the kh row
            taps into the contraction is what buys the MXU efficiency);
            the horizontal taps resolve with kw-1 lane rolls + edge masks
            on the OUTPUT (2 rolls for a 3x3, not per-tap work), and the
            result lands NHWC — no output staging transpose at all.
  dW        dW_tj = sum_r src_shift @ g^T    R-batched lane-dim
            contraction per tap against the channel-major cotangent.
  dx        z_tj = g_cat @ Wflip_tj          same structure as the forward
            with kernel spatially flipped and I/O transposed
            (K = kh*Cout), emitted NHWC. Skipped when the input needs no
            gradient (the stem's base conv differentiates only to dW —
            its input is the image).

Accumulation is float32 throughout; operands stage in bfloat16 (same
arithmetic class as the XLA bf16 conv replaced). Only stride 1 /
dilation 1 is supported — after space-to-depth packing every stem conv is
stride 1 on the packed grid, including the "stride 2" level1 whose packed
equivalent is a 2x2 stride-1 conv (models/dla.py:_s2d_weight_map).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _conv_row_block(h: int, k_sub: int, w: int, cout: int) -> int:
    """Rows per grid step: keep src_cat (R, K, W) bf16 + the (R, W, Cout)
    f32 accumulator comfortably in VMEM."""
    import os

    env = os.environ.get("CONV_PALLAS_RBLK")  # perf-tuning A/B knob
    if env:
        return int(env)
    for r in (32, 16, 8):
        if h % r == 0 and h >= r:
            bytes_blk = r * k_sub * w * 2 + 2 * r * w * cout * 4
        else:
            continue
        if bytes_blk <= 12 * 1024 * 1024:
            return r
    return min(h, 8)


def _shift_mask(w: int, shift: int):
    """(1, W, 1) float32 mask zeroing the columns a lane roll by ``shift``
    wrapped around (the conv's zero padding)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    if shift > 0:
        return (lane >= shift).astype(jnp.float32)
    if shift < 0:
        return (lane < w + shift).astype(jnp.float32)
    return None


def _rolled(z: jax.Array, shift: int, w: int, axis: int) -> jax.Array:
    """roll ``z`` so result[i] = z[i - shift] along ``axis`` (width), with
    wrapped columns zeroed."""
    if shift == 0:
        return z
    zr = pltpu.roll(z, shift % w, axis)
    m = _shift_mask(w, shift)
    if axis == 2:
        m = m.reshape(1, 1, w)
    return zr * m


def _conv_fwd_kernel(xt_ref, w_ref, out_ref, *,
                     kh: int, kw: int, p_left: int,
                     w: int, cout: int, row_block: int):
    """out[r, wd, o] = sum_{tj} (src_cat @ W_tj)[r, wd + tj - p_left, o].

    xt_ref: (1, Hp, Cin_p, W) channel-major padded input (top pad p_top,
    so padded row r0 + ti reads input row r0 + ti - p_top).
    w_ref: (kw, kh*Cin_p, Cout) float32.
    """
    r_blk = row_block
    r0 = pl.program_id(1) * r_blk

    parts = [xt_ref[0, pl.ds(r0 + ti, r_blk)] for ti in range(kh)]
    src_cat = (jnp.concatenate(parts, axis=1) if kh > 1 else parts[0]
               )  # (R, kh*Cin_p, W) bf16
    out = jnp.zeros((r_blk, w, cout), jnp.float32)
    for tj in range(kw):
        z = jax.lax.dot_general(
            src_cat, w_ref[tj].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (R, W, Cout)
        out = out + _rolled(z, p_left - tj, w, axis=1)
    out_ref[0] = out.astype(out_ref.dtype)


def _conv_bwd_kernel(xt_ref, gt_ref, w_ref, dw_ref, dx_ref,
                     dw_acc, *,
                     kh: int, kw: int, p_left: int, p_top: int,
                     w: int, cin_p: int, cout: int, row_block: int,
                     needs_dx: bool):
    """dW (always) and dx (optional) from the channel-major stagings.

    gt_ref: (1, Hp_g, Cout, W) channel-major cotangent padded with
    (kh-1-p_top) rows on top (so padded row r0 + (kh-1) - ti reads
    cotangent row r0 + p_top - ti, the adjoint of the forward's row taps).
    w_ref: (kw, kh*Cout, Cin_p) float32 — spatially flipped, transposed
    kernel, tj-major like the forward's.
    dx_ref: (1, r_blk-grid output rows, W, Cin_p) NHWC.
    """
    r_blk = row_block
    rb = pl.program_id(1)
    r0 = rb * r_blk

    @pl.when(rb == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)

    # ---- dW: per (ti, tj), contract (rows x lanes) against g ------------
    # dW[ti, tj][c, o] = sum_{r, wd} x[r + ti - p_top, c, wd + tj - p_left]
    #                                g[r, o, wd]
    # gt's top pad is (kh-1-p_top), so cotangent row r0 sits at staged
    # index r0 + (kh-1-p_top)
    g_rows = gt_ref[0, pl.ds(r0 + (kh - 1 - p_top), r_blk)]  # (R, Cout, W)
    parts = [xt_ref[0, pl.ds(r0 + ti, r_blk)] for ti in range(kh)]
    src_cat = (jnp.concatenate(parts, axis=1) if kh > 1 else parts[0])
    # Mosaic lane rotates support 32-bit data only — shift in f32, cast
    # back per tap for the MXU
    src_f32 = src_cat.astype(jnp.float32)
    for tj in range(kw):
        src_sh = _rolled(src_f32, p_left - tj, w, axis=2)
        dwp = jax.lax.dot_general(
            src_sh.astype(jnp.bfloat16), g_rows,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (R, kh*Cin_p, Cout)
        dw_acc[tj] = dw_acc[tj] + jnp.sum(dwp, axis=0)

    @pl.when(rb == pl.num_programs(1) - 1)
    def _finalize():
        dw_ref[0] = dw_acc[:]

    # ---- dx: transposed conv, same shape of work as the forward ---------
    if needs_dx:
        gparts = [gt_ref[0, pl.ds(r0 + (kh - 1) - ti, r_blk)]
                  for ti in range(kh)]
        g_cat = (jnp.concatenate(gparts, axis=1) if kh > 1 else gparts[0])
        dx = jnp.zeros((r_blk, w, cin_p), jnp.float32)
        for tj in range(kw):
            z = jax.lax.dot_general(
                g_cat, w_ref[tj].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (R, W, Cin_p)
            dx = dx + _rolled(z, tj - p_left, w, axis=1)
        dx_ref[0] = dx.astype(dx_ref.dtype)
    else:
        dx_ref[0] = jnp.zeros_like(dx_ref[0])


def _stage_cm(a: jax.Array, pad_top: int, pad_bot: int) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, pad_top + H + pad_bot, C, W) channel-major
    bf16 staging."""
    return jnp.pad(
        a.astype(jnp.bfloat16),
        ((0, 0), (pad_top, pad_bot), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnames=("padding", "interpret"))
def conv2d_pallas_fwd(x: jax.Array, weight: jax.Array,
                      padding=((1, 1), (1, 1)),
                      interpret: bool = False) -> jax.Array:
    """Stride-1 NHWC conv: x (B,H,W,Cin), weight (kh,kw,Cin,Cout) HWIO,
    ``padding`` ((top, bottom), (left, right)). Output (B,H',W,Cout) in
    x.dtype (f32 accumulation), H' = H + pt + pb - kh + 1. Requires
    pt + pb == kh - 1 and pl + pr == kw - 1 (same-size output, the only
    configuration the packed stem uses)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    (pt, pb), (p_l, p_r) = padding
    assert pt + pb == kh - 1 and p_l + p_r == kw - 1, padding
    cin_p = _round_up(cin, 8)

    r_blk = _conv_row_block(h, kh * cin_p, w, cout)
    h_pad = _round_up(h, r_blk)
    xt = _stage_cm(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin))),
                   pt, pb + (h_pad - h))
    # (kw, kh*Cin_p, Cout): tj-major, (ti, c) flattened on the contraction
    w_cat = (jnp.pad(weight, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
             .astype(jnp.float32).transpose(1, 0, 2, 3)
             .reshape(kw, kh * cin_p, cout))

    kernel = functools.partial(
        _conv_fwd_kernel, kh=kh, kw=kw, p_left=p_l, w=w, cout=cout,
        row_block=r_blk)
    out = pl.pallas_call(
        kernel,
        grid=(b, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, h_pad + kh - 1, cin_p, w),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, kh * cin_p, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_blk, w, cout),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, w_cat)
    return out[:, :h]


@functools.partial(jax.jit,
                   static_argnames=("padding", "needs_dx", "interpret"))
def conv2d_pallas_bwd(x: jax.Array, weight: jax.Array, g: jax.Array,
                      padding=((1, 1), (1, 1)), needs_dx: bool = True,
                      interpret: bool = False):
    """Gradients of ``conv2d_pallas_fwd`` w.r.t. (weight, x). Returns
    (dw float32, dx in x.dtype — zeros when ``needs_dx`` is False)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    (pt, pb), (p_l, p_r) = padding
    assert pt + pb == kh - 1 and p_l + p_r == kw - 1, padding
    cin_p = _round_up(cin, 8)

    r_blk = _conv_row_block(h, kh * max(cin_p, cout), w, max(cout, cin_p))
    h_pad = _round_up(h, r_blk)
    xt = _stage_cm(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cin_p - cin))),
                   pt, pb + (h_pad - h))
    # g staged channel-major with (kh-1-pt) top rows so row r0+(kh-1)-ti
    # reads cotangent row r0 + pt - ti (dx adjoint) and row r0+(kh-1)
    # aligns with output row r0 (dW)
    gt = _stage_cm(g, kh - 1 - pt, pt + (h_pad - h))
    # dx weights: (kw, kh*Cout, Cin_p), channel-transposed but NOT
    # spatially flipped — the adjoint's tap flip is already encoded in the
    # g_cat row indices (r0 + pt - ti) and the reversed roll direction
    wdx = jnp.pad(weight.transpose(0, 1, 3, 2).astype(jnp.float32),
                  ((0, 0), (0, 0), (0, 0), (0, cin_p - cin)))
    wdx_cat = wdx.transpose(1, 0, 2, 3).reshape(kw, kh * cout, cin_p)

    kernel = functools.partial(
        _conv_bwd_kernel, kh=kh, kw=kw, p_left=p_l, p_top=pt, w=w,
        cin_p=cin_p, cout=cout, row_block=r_blk, needs_dx=needs_dx)
    dw_b, dx_full = pl.pallas_call(
        kernel,
        grid=(b, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, h_pad + kh - 1, cin_p, w),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad + kh - 1, cout, w),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kw, kh * cout, cin_p), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, kw, kh * cin_p, cout),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, cin_p), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, kw, kh * cin_p, cout), jnp.float32),
            jax.ShapeDtypeStruct((b, h_pad, w, cin_p), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((kw, kh * cin_p, cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, gt, wdx_cat)

    # (B, kw, kh*Cin_p, Cout) -> (kh, kw, Cin, Cout)
    dw = (dw_b.sum(axis=0).reshape(kw, kh, cin_p, cout)
          .transpose(1, 0, 2, 3)[:, :, :cin].astype(weight.dtype))
    dx = dx_full[:, :h, :, :cin] if needs_dx else None
    return dw, dx


@functools.lru_cache(maxsize=None)
def _conv_op(padding, needs_dx: bool):
    """custom_vjp conv for a static (padding, needs_dx) configuration."""

    @jax.custom_vjp
    def op(x, weight):
        return conv2d_pallas_fwd(x, weight, padding=padding)

    def fwd(x, weight):
        return op(x, weight), (x, weight)

    def bwd(res, g):
        x, weight = res
        dw, dx = conv2d_pallas_bwd(x, weight, g, padding=padding,
                                   needs_dx=needs_dx)
        if dx is None:
            # the caller promised x needs no gradient (stem base conv —
            # its input is the image batch); a zero cotangent keeps the
            # vjp well-formed without computing the transposed conv
            dx = jnp.zeros_like(x)
        return dx, dw

    op.defvjp(fwd, bwd)
    return op


def conv2d_pallas(x: jax.Array, weight: jax.Array, padding,
                  needs_dx: bool = True) -> jax.Array:
    """Differentiable stride-1 Pallas conv (see module docstring).

    ``needs_dx=False`` skips the transposed conv in the backward and
    returns a ZERO input cotangent — only valid when x does not require a
    gradient."""
    padding = tuple((int(a), int(b)) for a, b in padding)
    return _conv_op(padding, bool(needs_dx))(x, weight)


def conv2d_pallas_supported(x, weight, stride, padding) -> bool:
    """Envelope: stride 1, same-size output, kernel <= 7, image fits the
    staging comfortably (width a lane multiple keeps rolls cheap)."""
    kh, kw = weight.shape[:2]
    (pt, pb), (p_l, p_r) = padding
    b, h, w, cin = x.shape
    cout = weight.shape[3]
    cin_p = _round_up(cin, 8)
    resident = ((h + kh) * cin_p * w * 2          # xt
                + (h + kh) * cout * w * 2         # gt (backward)
                + h * w * max(cout, cin_p) * 4)   # accumulators/output
    return (tuple(stride) == (1, 1)
            and pt + pb == kh - 1 and p_l + p_r == kw - 1
            and max(kh, kw) <= 7
            and w % 128 == 0 and w <= 512 and h % 8 == 0
            and resident <= 64 * 1024 * 1024)
