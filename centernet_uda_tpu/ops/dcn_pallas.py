"""Fused Pallas TPU kernel for DCNv2 forward sampling + matmul.

The XLA formulation in ``ops/dcn.py`` is row-gather-bound (~117M gathered
rows/s on v5e): 4 corners x 9 taps x HW gathers per image make the big DLA
layers ~40x slower than a plain conv. This kernel restructures the sampling
for the TPU's actual shuffle hardware:

- **x-lookup on the MXU**: the bilinear weights of both x-corners fold
  into ONE select matrix — in the forward a per-tap bilinear *hat*
  ``H[r, src_lane, dst_lane] = max(0, 1 - |px - src_lane|)`` (row-shift
  independent, so each shift is just a batched bf16 matmul plus an
  (R, W) column scale); in the backward the per-shift one-hot
  compare+select form (the hat restructure regressed there — see the
  note in ``_dcn_bwd_params_kernel``). Both measured faster than a lane
  gather and a shift-and-roll loop at every offset scale on v5e.
- **y-lookup**: a *shift-and-select* loop over bounded row displacements
  ``d`` whose trip range is the block's ACTUAL displacement extent
  (``min/max(floor(py) - row)``), so the loop cost tracks the offset
  spread — near-zero offsets (the zero-initialized ``conv_offset_mask``
  regime, dcn_v2.py:119-121) visit only ~2 shifts per tap. No per-shift
  ``lax.cond``: within the dynamic bounds nearly every shift is active,
  and the cond was measured to cost more than the work it skips.
- the 3x3 tap matmuls run on the MXU per row-block
  (``dot_general`` batched over rows), accumulating the output in fp32.

Scope (asserted): kernel 3x3, stride 1, padding 1, dilation 1,
deformable_groups 1 — exactly the configuration every reference backend
uses (backends/dla.py:358-367, backends/mobilenetv2.py:146-148).

TWO kernel generations live here; the default "auto" mode routes each map
shape to the measured-fastest one (``generation_for``):
- "lanes" (this banner's design, fastest inside its envelope): W <= 256
  native — Mosaic tiles the lane axis, so widths past 128 run as two lane
  tiles with EXACT horizontal sampling (the 800px eval pyramid's W=200
  maps; measured faster than select in both directions on v5e, round 5).
  Small maps lane-pack several images per 128-lane register row
  (``_pack_factor``); Cin <= 512. Auto routes every such shape here.
  Forced-lanes also panel-tiles W > 256 forwards (horizontal clamp there).
- "select" (section banner further down): the same one-hot-matmul idea in
  the native NHWC layout — no transposes, no width/Cin special cases,
  fused backward everywhere, exact horizontal sampling. Auto routes
  W > 256 maps and deep heads (MobileNetV2's Cin=1280) here; measured
  over the XLA formulation and a retired sublane-roll generation ("nhwc",
  git history: superseded 5.8x/3.5x at 4x200x200x64 std=1.0) at every
  offset scale.

Vertical offsets are clamped to ``max_shift`` (default 14) pixels — while
the reference CUDA kernel allows unbounded offsets; trained CenterNet
offsets stay well inside this budget (training stats surface
``dcn_max_abs_dy`` to catch saturation) — the XLA path
(``use_pallas=False``) keeps the exact unbounded semantics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel generation: "auto" (default) routes each map shape to the
# measured-fastest kernel; "lanes" / "select" force one generation for
# A/B benchmarking (tools/bench_dcn_ab.py).
#   - "lanes": the W-on-lanes one-hot-select kernels — fastest inside
#     their native envelope (A/B on v5e at std=0.1 across the DLA ladder:
#     128x128x64 fwd 4.6 / bwd 7.4 ms vs select 8.8 / 26.9), but
#     lane-extent-bound: W <= 128 native, W > 128 only via panel-tiled
#     forward + XLA backward, Cin <= 512 (VMEM gate).
#   - "select": the same one-hot matmuls in the native NHWC layout — no
#     staging transposes, any W/Cin, fused backward everywhere, exact
#     horizontal sampling. A/B on v5e at the lanes-excluded shapes:
#     4x200x200x64 fwd 6.4 / bwd 20.4 ms at std=0.1, 12.2 / 39.4 at
#     std=1.0 (the retired "nhwc" sublane-roll generation: 14.0 / 27.4
#     and 70 / 138 respectively; the XLA formulation: far slower).
_KERNEL_VERSION = os.environ.get("CENTERNET_DCN_KERNEL", "auto")

_VERSIONS = ("auto", "lanes", "select")


def set_kernel_version(version: str) -> None:
    global _KERNEL_VERSION
    if version not in _VERSIONS:
        raise ValueError(
            f"kernel version must be one of {_VERSIONS}, got {version!r}")
    _KERNEL_VERSION = version


def get_kernel_version() -> str:
    return _KERNEL_VERSION


def _resolve_interpret(interpret) -> bool:
    """``None`` -> interpret mode iff the default backend is CPU.

    The Mosaic kernels only lower on TPU; resolving at the dispatch layer
    lets the in-model Pallas path (``ops.dcn.DCN`` with ``dcn_impl: pallas``)
    run the SAME code interpreted in CPU tests — e.g. the eval-time
    clamp-degrade test — instead of failing to lower."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


# native lane extent of the lanes kernels: Mosaic tiles the lane axis, so
# widths up to two 128-lane tiles run natively (no overlapping panels, no
# horizontal clamp). Measured at 8x200x200x64 on v5e (round 5): native
# lanes beat both the panel-tiled forward and the select generation in
# both directions — see BASELINE.md.
_LANES_NATIVE_MAX_W = 256


def generation_for(x_shape) -> str:
    """Which kernel generation handles a (B, H, W, Cin) map.

    Under "auto": the lanes kernels inside their native envelope
    (8 <= W <= 256 lane extent — Mosaic lane-tiles widths past 128 —
    Cin <= 512 VMEM working set; measured fastest there across the whole
    DLA ladder AND the 800px eval pyramid's W=200 maps, A/B on v5e), the
    "select" kernels everywhere else (MobileNetV2's 1280-channel neck
    head, W > 256; measured fastest there at every offset scale) — one
    generation per shape for BOTH directions, so no shape ever
    differentiates through the slow XLA formulation."""
    if _KERNEL_VERSION != "auto":
        return _KERNEL_VERSION
    w, cin = x_shape[2], x_shape[3]
    if 8 <= w <= _LANES_NATIVE_MAX_W and cin <= 512:
        return "lanes"
    return "select"


def _row_block(h: int, cin: int, w: int = 128) -> int:
    import os

    env = os.environ.get("DCN_RBLK")  # perf-tuning A/B knob
    if env and h >= int(env):
        return int(env)
    if w > 128:
        # the (R, W, W) select/hat/corner buffers grow quadratically in W;
        # past one lane tile the smallest block wins — A/B at 8x200x200x64
        # on v5e: bwd 13.7 (r=8) / 15.7 (16) / 17.4 (32) ms, fwd 7.7 / 7.8
        # / 8.6
        return min(h, 8)
    # keep the (R, Cin, W) f32 accumulator + (R, W, W) selects in VMEM
    budget = max(4096 // max(cin, 1), 8)
    # 64-row blocks measured ~10% SLOWER at the hot shape (VMEM pressure
    # outweighs the per-block savings)
    for r in (32, 16, 8):
        if r > budget or h < r:
            continue
        # staging pads H to whole blocks (padded rows contribute exactly
        # zero in both directions); accept a block size whose padding
        # waste stays under ~12.5% — e.g. H=200 runs r=32 over 224 rows
        # instead of 25 tiny r=8 programs
        if (-(-h // r) * r - h) / h <= 0.125:
            return r
    return min(h, 8)


def _pack_factor(b: int, w: int) -> int:
    """How many images to pack side-by-side on the 128-lane axis.

    Small feature maps (W < 128 — the DLA neck runs DCN at W down to 16,
    backends/dla.py:375-441) would otherwise use W/128 of each vector
    register; packing pk images recovers full lane utilization and divides
    the grid by pk. pk must divide the batch."""
    pk = 1
    while pk * 2 * w <= 128 and b % (pk * 2) == 0:
        pk *= 2
    return pk


def _pack_w(a: jax.Array, pk: int) -> jax.Array:
    """(B, H, W, K) -> (B/pk, H, pk*W, K): pk images side by side."""
    if pk == 1:
        return a
    b, h, w, k = a.shape
    return (a.reshape(b // pk, pk, h, w, k)
            .transpose(0, 2, 1, 3, 4)
            .reshape(b // pk, h, pk * w, k))


def _unpack_w(a: jax.Array, pk: int) -> jax.Array:
    """Inverse of ``_pack_w`` on a (B/pk, H, pk*W, K) array."""
    if pk == 1:
        return a
    bp, h, wl, k = a.shape
    return (a.reshape(bp, h, pk, wl // pk, k)
            .transpose(0, 2, 1, 3, 4)
            .reshape(bp * pk, h, wl // pk, k))


def _seg_grids(r_blk: int, wl: int, w_img: int):
    """Per-lane (segment-local column, segment base) for packed layouts.

    wl = pk * w_img lanes hold pk images side by side; the division is by
    a trace-time constant via the exact midpoint-float trick (wl <= 128).
    """
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, wl), 1)
    if wl == w_img:
        return iota, None
    seg = jnp.floor((iota.astype(jnp.float32) + 0.5) * (1.0 / w_img)
                    ).astype(jnp.int32)
    seg_base = seg * w_img
    return iota - seg_base, seg_base


def _dcn_kernel(xt_ref, off_ref, mask_ref, w_ref, b_ref, out_ref, *,
                h: int, w: int, w_img: int, cin: int, cout: int,
                pad_rows: int, max_shift: int, row_block: int,
                panel_wp: int = 0):
    """Program (i, r): image group i, row block r. Layouts (W = pk lane-
    packed images of width w_img each, see ``_pack_factor``):
    xt_ref   (1, H+2P, Cin, W) bf16  row-padded, W-on-lanes transpose
    off_ref  (1, 18, R, W)     f32   (dy, dx) interleaved per tap
    mask_ref (1, 9, R, W)      f32   post-sigmoid modulation
    w_ref    (9, Cin, Cout)    f32   tap-major kernel
    b_ref    (1, Cout)         f32
    out_ref  (1, R, W, Cout)   f32

    ``panel_wp > 0``: wide-map mode (real width w_img > 128) — program
    (i, p, r) computes panel p, a 128-lane window at real columns
    [p*panel_wp - halo, ...+128) with halo = pad_rows; horizontal offsets
    are clamped to max_shift (mirroring the vertical clamp) so the kept
    middle panel_wp columns never sample outside their window; validity
    is evaluated in real coordinates. Refs carry an extra panel dim.
    """
    r_blk = row_block
    if panel_wp:
        origin = pl.program_id(1) * panel_wp - pad_rows
        r0 = pl.program_id(2) * r_blk
        offp, maskp = off_ref[0, 0], mask_ref[0, 0]
    else:
        origin = 0
        r0 = pl.program_id(1)
        r0 = r0 * r_blk
        offp, maskp = off_ref[0], mask_ref[0]
    dmin, dmax = -max_shift - 2, max_shift + 2

    out_acc = jnp.zeros((r_blk, w, cout), jnp.float32)
    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    # source-lane index on dim 1 for the x-resolve hat matrix:
    # hat[r, pos, j] = bilinear weight of source lane pos for output j
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)
    posf = pos.astype(jnp.float32)
    # invalid source lanes are pushed to +1e9 so the hat weight vanishes
    # without a per-tap mask multiply
    if panel_wp:
        jgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 1)
        seg_base = None
        # source-lane validity in REAL coordinates: panel lanes outside
        # the image sample zero (the CUDA `p > -1 && p < W` guard)
        posf = jnp.where((pos + origin >= 0) & (pos + origin <= w_img - 1),
                         posf, 1e9)
    else:
        jgrid, seg_base = _seg_grids(r_blk, w, w_img)
        if seg_base is not None:
            # lane-packed: a sample near an image's edge must not read the
            # neighboring packed image's lanes
            posf = jnp.where((pos >= seg_base[:, None, :])
                             & (pos < seg_base[:, None, :] + w_img),
                             posf, 1e9)

    for t in range(9):
        ti, tj = t // 3, t % 3
        off_y = jnp.clip(offp[2 * t], -max_shift, max_shift)
        off_x = offp[2 * t + 1]
        if panel_wp:
            off_x = jnp.clip(off_x, -max_shift, max_shift)
        m = maskp[t]

        py = rgrid.astype(jnp.float32) + (ti - 1) + off_y
        px = jgrid.astype(jnp.float32) + (tj - 1) + off_x
        if seg_base is not None:
            px = px + seg_base.astype(jnp.float32)

        y0f = jnp.floor(py)
        fy = py - y0f
        y0 = y0f.astype(jnp.int32)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

        # x-resolve as a bilinear HAT matrix, built ONCE per tap (px does
        # not depend on the row shift): hat[r, pos, j] = max(0, 1-|px-pos|)
        # folds both x-corners' weights, border zeros, and (packed) segment
        # isolation into one tensor. Per shift the remaining work is a
        # single batched matmul off the bf16 image rows plus an (R, W)
        # column scale — the compare+select one-hot build this replaces was
        # the kernel's VPU bottleneck (~6 ops/elem per shift vs ~5 per tap).
        hat = jnp.maximum(1.0 - jnp.abs(px[:, None, :] - posf), 0.0
                          ).astype(jnp.bfloat16)

        # y-corner weights per output pixel (mask folded in)
        a0 = jnp.where(vy0, (1 - fy), 0.0) * m  # weight of row y0
        a1 = jnp.where(vy1, fy, 0.0) * m        # weight of row y0+1

        rel = y0 - rgrid  # bounded row shift of the y0 corner
        # dynamic shift range over the displacements whose corner weight is
        # actually NONZERO in this block: integer vertical sampling
        # (fy == 0 — e.g. the zero-initialized conv_offset_mask regime)
        # needs only the y0 corner, so its taps run ONE shift instead of
        # two; border-invalid corners, padded rows (m == 0), and masked-out
        # pixels drop out the same way. Skipped shifts contribute exactly
        # zero (yw == 0 elementwise), so this is bit-exact.
        need0 = a0 > 0.0
        need1 = a1 > 0.0
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)  # inclusive

        def shift_body(d, s):
            yw = ((rel == d).astype(jnp.float32) * a0
                  + (rel + 1 == d).astype(jnp.float32) * a1)
            if panel_wp:
                src = xt_ref[0, 0, pl.ds(r0 + pad_rows + d, r_blk)]
            else:
                src = xt_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]
            hsrc = jax.lax.dot_general(
                src, hat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (R, Cin, W)
            return s + hsrc * yw[:, None, :]

        s = jax.lax.fori_loop(
            jnp.maximum(d_lo, dmin), jnp.minimum(d_hi, dmax) + 1, shift_body,
            jnp.zeros((r_blk, cin, w), jnp.float32),
        )

        # (R, Cin, W) x (Cin, Cout), batched over rows -> MXU (bf16 inputs,
        # f32 accumulate: the samples were bf16-staged anyway)
        out_acc = out_acc + jax.lax.dot_general(
            s.astype(jnp.bfloat16),
            w_ref[t].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # output in the image dtype (f32 accumulation throughout): a bf16 store
    # halves the HBM write + the downstream BN's read per DCN layer
    if panel_wp:
        out_ref[0, 0] = (out_acc + b_ref[0][None, None, :]
                         ).astype(out_ref.dtype)
    else:
        out_ref[0] = (out_acc + b_ref[0][None, None, :]).astype(out_ref.dtype)


def dcn_v2_pallas(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    max_shift: int = 14,
    interpret: bool | None = None,
) -> jax.Array:
    """Pallas DCNv2 forward — dispatches per shape to the active kernel
    generation (``generation_for`` / ``set_kernel_version``)."""
    interpret = _resolve_interpret(interpret)
    if generation_for(x.shape) == "select":
        return dcn_v2_pallas_select(x, offset, mask, weight, bias,
                                    max_shift=max_shift, interpret=interpret)
    return dcn_v2_pallas_lanes(x, offset, mask, weight, bias,
                               max_shift=max_shift, interpret=interpret)


def dcn_v2_pallas_bwd(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    g: jax.Array,
    max_shift: int = 14,
    interpret: bool | None = None,
):
    """Pallas DCNv2 backward — dispatches like ``dcn_v2_pallas``."""
    interpret = _resolve_interpret(interpret)
    if generation_for(x.shape) == "select":
        return dcn_v2_pallas_bwd_select(x, offset, mask, weight, g,
                                        max_shift=max_shift,
                                        interpret=interpret)
    return dcn_v2_pallas_bwd_lanes(x, offset, mask, weight, g,
                                   max_shift=max_shift, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_lanes(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    max_shift: int = 14,
    interpret: bool = False,
) -> jax.Array:
    """W-on-lanes Pallas DCNv2 forward (3x3 / stride 1 / pad 1 / dilation 1).

    Same operand contract as ``ops.dcn.dcn_v2``: x (B,H,W,Cin) NHWC,
    offset (B,H,W,18) interleaved (dy,dx), mask (B,H,W,9) post-sigmoid,
    weight (3,3,Cin,Cout) HWIO. Returns (B,H,W,Cout) in x.dtype (the
    accumulation is float32 regardless).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "pallas DCN kernel is 3x3 only"
    assert offset.shape == (b, h, w, 18)
    assert mask.shape == (b, h, w, 9)
    if w > _LANES_NATIVE_MAX_W:
        # beyond two lane tiles: overlapping 128-lane panels (horizontal
        # offsets clamp there; the native path below samples x exactly)
        return _dcn_v2_pallas_wide(x, offset, mask, weight, bias,
                                   max_shift, interpret)

    pad_rows = max_shift + 2
    r_blk = _row_block(h, cin, w)
    # pad H to a whole number of row blocks (e.g. the 100-row maps of 800px
    # eval); padded rows have zero offsets/mask and are sliced away
    h_pad = -(-h // r_blk) * r_blk
    extra = h_pad - h

    # lane-pack small maps: pk images side by side on the 128-lane axis
    pk = _pack_factor(b, w)
    w_img, wl, bp = w, pk * w, b // pk
    x = _pack_w(x, pk)
    offset = _pack_w(offset, pk)
    mask = _pack_w(mask, pk)

    # zero row padding covers every clamped shift; (H+2P, Cin, W) puts the
    # gatherable x-axis on lanes; bf16 staging halves VMEM read traffic
    # (measured faster than f32 staging despite the per-shift convert)
    xt = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)

    off_t = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, extra), (0, 0), (0, 0))
                    ).transpose(0, 3, 1, 2)  # (B',18,Hp,Wl)
    mask_t = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, extra), (0, 0), (0, 0))
                     ).transpose(0, 3, 1, 2)  # (B',9,Hp,Wl)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    bias_in = (bias if bias is not None
               else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)

    kernel = functools.partial(
        _dcn_kernel, h=h, w=wl, w_img=w_img, cin=cin, cout=cout,
        pad_rows=pad_rows, max_shift=max_shift, row_block=r_blk,
    )

    out = pl.pallas_call(
        kernel,
        grid=(bp, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, h_pad + 2 * pad_rows, cin, wl),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, r_blk, wl), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, r_blk, wl), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_blk, wl, cout),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h_pad, wl, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, off_t, mask_t, w_taps, bias_in)
    return _unpack_w(out, pk)[:, :h]


def _dcn_v2_pallas_wide(x, offset, mask, weight, bias, max_shift, interpret):
    """Forward for real widths above the 128-lane extent (the 800px eval
    pyramid runs the stride-4 DCN layers at W=200, configs/defaults.yaml:67).

    The width is tiled into overlapping 128-lane panels: each panel keeps
    its middle ``wp`` columns and carries a ``halo = max_shift + 2`` column
    margin on both sides, so with horizontal offsets clamped to max_shift
    (mirroring the vertical clamp; the XLA path keeps exact semantics) no
    kept output ever samples outside its panel.
    """
    b, h, w, cin = x.shape
    cout = weight.shape[3]
    pad_rows = max_shift + 2
    halo = pad_rows
    wp = 128 - 2 * halo
    n_p = -(-w // wp)

    r_blk = _row_block(h, cin)
    h_pad = -(-h // r_blk) * r_blk
    extra = h_pad - h
    col_r = n_p * wp + halo - w  # right margin incl. last-panel slack

    xt = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)  # (B, Hp+2P, Cin, W)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (halo, col_r)))
    x_pan = jnp.stack([xt[..., p * wp:p * wp + 128] for p in range(n_p)], 1)

    off_t = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, extra), (0, 0), (0, 0))
                    ).transpose(0, 3, 1, 2)  # (B,18,Hp,W)
    off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, 0), (halo, col_r)))
    off_pan = jnp.stack([off_t[..., p * wp:p * wp + 128]
                         for p in range(n_p)], 1)
    mask_t = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, extra), (0, 0), (0, 0))
                     ).transpose(0, 3, 1, 2)
    mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, 0), (halo, col_r)))
    mask_pan = jnp.stack([mask_t[..., p * wp:p * wp + 128]
                          for p in range(n_p)], 1)

    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    bias_in = (bias if bias is not None
               else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)

    kernel = functools.partial(
        _dcn_kernel, h=h, w=128, w_img=w, cin=cin, cout=cout,
        pad_rows=pad_rows, max_shift=max_shift, row_block=r_blk,
        panel_wp=wp,
    )
    hp2 = h_pad + 2 * pad_rows
    out = pl.pallas_call(
        kernel,
        grid=(b, n_p, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, 1, hp2, cin, 128),
                         lambda i, p, r: (i, p, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 18, r_blk, 128),
                         lambda i, p, r: (i, p, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, r_blk, 128),
                         lambda i, p, r: (i, p, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, p, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, p, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, r_blk, 128, cout),
                               lambda i, p, r: (i, p, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_p, h_pad, 128, cout),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_pan, off_pan, mask_pan, w_taps, bias_in)

    # keep each panel's middle wp columns, stitch, trim to the real width
    kept = out[:, :, :, halo:halo + wp]                # (B, n_p, Hp, wp, C)
    full = kept.transpose(0, 2, 1, 3, 4).reshape(b, h_pad, n_p * wp, cout)
    return full[:, :h, :w]



# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _dcn_bwd_params_kernel(xt_ref, off_ref, mask_ref, w_ref, g_ref,
                           doff_ref, dmask_ref, dw_out_ref, dxp_ref,
                           dw_acc, s_acc, dx_acc, *,
                           h: int, w: int, w_img: int, cin: int, cout: int,
                           pad_rows: int, max_shift: int, row_block: int):
    """All gradients in ONE source-centric pass.

    Recomputes the forward sampling per output-row block. Per (tap, shift)
    iteration — three batched MXU matmuls off the bf16 image rows, no lane
    gathers and no lax.cond (both measured slower than the matmul work
    they replace, see the forward kernel) — with gcol = g @ W_t^T once per
    tap and ONE shared one-hot select matrix s_w (modulated bilinear
    corner weights folded in, as in the forward):
      s_acc   += src @ s_w          — the modulated column m*u, so
                 dW[t] = sum_r s_acc[r] @ g[r] on the MXU
      dx      += s_w @ gcol          — the weighted x-scatter, accumulated
                 straight into the whole-image dx block, which every
                 row-block program of an image revisits (it stays resident
                 in VMEM; TPU grid iteration is sequential so no atomics)
      E        = src^T . gcol        — (R, Wsrc, W) corner contraction from
                 which e0/e1 (and so dmask[t] / doffset with the analytic
                 bilinear-weight derivative coefficients) are unweighted
                 one-hot row-reductions; all further arithmetic is (R, W).
    Layouts as in the forward kernel; g_ref is the (1, R, W, Cout)
    cotangent block; dxp_ref the (1, Hp+2P, W, Cin) whole-image dx.
    """
    r_blk = row_block
    rb = pl.program_id(1)
    n_rb = pl.num_programs(1)
    r0 = rb * r_blk

    @pl.when(rb == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        # dx accumulates in a whole-image f32 VMEM scratch revisited by
        # every row-block program of this image (no HBM partials, no band
        # summation) and is written back ONCE per image in the output
        # dtype — bf16 under the training default, halving the dominant
        # HBM write of the backward
        dx_acc[:] = jnp.zeros_like(dx_acc)

    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    jgrid, seg_base = _seg_grids(r_blk, w, w_img)
    # pos index on dim 1 for the x-scatter: S[r, pos, j] = (x_idx[r,j]==pos)
    # NOTE: the forward's per-tap hat-matrix restructure was A/B'd here too
    # and REGRESSED the backward 25-40% at every shape/offset scale (v5e,
    # git history): the per-tap (R, Cin, W) gcol transpose plus TWO
    # persistent (R, W, W) bf16 loop operands (hat + its px-derivative)
    # cost Mosaic more than the per-shift compare+select builds they
    # replace — the backward's e0/e1 reductions keep the one-hot form.
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)
    g_blk = g_ref[0]  # (R, W, Cout)

    for t in range(9):
        ti, tj = t // 3, t % 3
        off_y_raw = off_ref[0, 2 * t]
        off_y = jnp.clip(off_y_raw, -max_shift, max_shift)
        off_x = off_ref[0, 2 * t + 1]
        m = mask_ref[0, t]

        py = rgrid.astype(jnp.float32) + (ti - 1) + off_y
        px = jgrid.astype(jnp.float32) + (tj - 1) + off_x
        y0f = jnp.floor(py)
        x0f = jnp.floor(px)
        fy = py - y0f
        fx = px - x0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        val00 = ((y0 >= 0) & (y0 <= h - 1) & (x0 >= 0) & (x0 <= w_img - 1)
                 ).astype(jnp.float32)
        val01 = ((y0 >= 0) & (y0 <= h - 1) & (x0 + 1 >= 0)
                 & (x0 + 1 <= w_img - 1)).astype(jnp.float32)
        val10 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1) & (x0 >= 0)
                 & (x0 <= w_img - 1)).astype(jnp.float32)
        val11 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1) & (x0 + 1 >= 0)
                 & (x0 + 1 <= w_img - 1)).astype(jnp.float32)

        x0c = jnp.clip(x0, 0, w_img - 1)
        x1c = jnp.clip(x0 + 1, 0, w_img - 1)
        if seg_base is not None:
            x0c = x0c + seg_base
            x1c = x1c + seg_base

        gcol = jax.lax.dot_general(
            g_blk.astype(jnp.bfloat16), w_ref[t].astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, W, Cin)

        rel = y0 - rgrid
        # shift range over rows with at least one VALID corner: unlike the
        # forward, fy == 0 does NOT drop the y0+1 corner here (the
        # coordinate gradient samples it regardless of its bilinear
        # weight), so the bounds only shed border rows and the zero-padded
        # block tail (whose y0 lies beyond h-1). Bit-exact: skipped shifts
        # have all corner validities zero.
        need0 = (val00 > 0) | (val01 > 0)
        need1 = (val10 > 0) | (val11 > 0)
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)  # inclusive

        s_acc[:] = jnp.zeros_like(s_acc)

        # the x-corner one-hots are SHIFT-INDEPENDENT: build them once per
        # tap and reuse across the d-loop for the select build and both
        # corner reductions (the per-shift compare was ~4 of the ~10
        # (R, W, W) VPU ops per iteration). Kept as booleans — the earlier
        # negative result hoisted fully-built bf16 one-hot MATMUL operands,
        # which Mosaic handled worse than compare+select (see note above).
        p0 = x0c[:, None, :] == pos
        p1 = x1c[:, None, :] == pos

        # corner coefficients, all (R, W): u-combine (c**), bilinear-weight
        # y/x-derivative combos (dy**, dxc**), and the modulated scatter
        # weights (w**s = m * c**)
        c00 = val00 * (1 - fy) * (1 - fx)
        c01 = val01 * (1 - fy) * fx
        c10 = val10 * fy * (1 - fx)
        c11 = val11 * fy * fx
        dy00 = -val00 * (1 - fx)
        dy01 = -val01 * fx
        dy10 = val10 * (1 - fx)
        dy11 = val11 * fx
        dxc00 = -val00 * (1 - fy)
        dxc01 = val01 * (1 - fy)
        dxc10 = -val10 * fy
        dxc11 = val11 * fy
        w00s, w01s, w10s, w11s = m * c00, m * c01, m * c10, m * c11
        gcol_b = gcol.astype(jnp.bfloat16)

        def shift_body(d, carry):
            dmask_t, doffy_t, doffx_t = carry
            sel0 = (rel == d).astype(jnp.float32)
            sel1 = (rel + 1 == d).astype(jnp.float32)
            a_w = sel0 * w00s + sel1 * w10s
            b_w = sel0 * w01s + sel1 * w11s
            # ONE one-hot select matrix with the modulated bilinear corner
            # weights folded in, shared by the dW column and the dx scatter
            s_w = (jnp.where(p0, a_w[:, None, :], 0.0)
                   + jnp.where(p1, b_w[:, None, :], 0.0)
                   ).astype(jnp.bfloat16)
            src = xt_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]  # (R, Cin, W)

            # modulated column m*u for dW: s_acc += src @ s_w
            s_acc[:] = s_acc[:] + jax.lax.dot_general(
                src, s_w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

            # dx: sources at shift d write input rows r0+d+[0,R) == band
            # rows P+d+[0,R); one batched matmul scatters both x-corners.
            contrib = jax.lax.dot_general(
                s_w, gcol_b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wpos, Cin)
            row = r0 + pad_rows + d
            dx_acc[pl.ds(row, r_blk)] = (
                dx_acc[pl.ds(row, r_blk)] + contrib)

            # corner contraction E[r, jsrc, j] = sum_c src[c, jsrc] gcol[j, c]
            # from which e0/e1 are unweighted one-hot row-reductions; every
            # dmask/doffset term is then a (R, W)-sized combination
            e_mat = jax.lax.dot_general(
                src, gcol_b, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wsrc, W)
            e0 = jnp.sum(jnp.where(p0, e_mat, 0.0), axis=1)
            e1 = jnp.sum(jnp.where(p1, e_mat, 0.0), axis=1)
            dmask_t = dmask_t + (sel0 * (c00 * e0 + c01 * e1)
                                 + sel1 * (c10 * e0 + c11 * e1))
            doffy_t = doffy_t + (sel0 * (dy00 * e0 + dy01 * e1)
                                 + sel1 * (dy10 * e0 + dy11 * e1))
            doffx_t = doffx_t + (sel0 * (dxc00 * e0 + dxc01 * e1)
                                 + sel1 * (dxc10 * e0 + dxc11 * e1))
            return dmask_t, doffy_t, doffx_t

        zero_rw = jnp.zeros((r_blk, w), jnp.float32)
        dmask_t, doffy_t, doffx_t = jax.lax.fori_loop(
            jnp.maximum(d_lo, -max_shift - 2),
            jnp.minimum(d_hi, max_shift + 2) + 1,
            shift_body, (zero_rw, zero_rw, zero_rw))

        # dW[t] += sum_r s[r] (Cin, W) @ g[r] (W, Cout), batched on the MXU
        dw_r = jax.lax.dot_general(
            s_acc[:].astype(jnp.bfloat16), g_blk.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, Cin, Cout)
        dw_acc[t] = dw_acc[t] + jnp.sum(dw_r, axis=0)

        dmask_ref[0, t] = dmask_t
        doff_y = m * doffy_t
        doff_x = m * doffx_t
        doff_y = jnp.where(jnp.abs(off_y_raw) < max_shift, doff_y, 0.0)
        doff_ref[0, 2 * t] = doff_y
        doff_ref[0, 2 * t + 1] = doff_x

    @pl.when(rb == n_rb - 1)
    def _finalize():
        dw_out_ref[0] = dw_acc[:]
        dxp_ref[0] = dx_acc[:].astype(dxp_ref.dtype)


def _bwd_stage(x, offset, mask, weight, g, max_shift):
    """Staging for the backward kernel: lane packing, row padding, the
    W-on-lanes transpose, channel-major offset/mask layout."""
    b, h, w, cin = x.shape
    _, _, _, cout = weight.shape
    pad_rows = max_shift + 2

    # one (R, Cin, W) accumulator + the (R, W, Cout) cotangent + the
    # (R, W, W) select + (R, W, W) corner contraction bound the block
    # height (the matmul-based body dropped the old *2 safety factor)
    r_blk = _row_block(h, max(cin, cout), w)
    # pad H to whole row blocks (padded rows: zero offsets/mask/cotangent ->
    # zero contributions; outputs sliced back to h)
    h_pad = -(-h // r_blk) * r_blk
    extra = h_pad - h

    pk = _pack_factor(b, w)
    x = _pack_w(x, pk)
    offset = _pack_w(offset, pk)
    mask = _pack_w(mask, pk)
    g = _pack_w(g, pk)

    xt = jnp.pad(
        x.astype(jnp.bfloat16),
        ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)
    off_t = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, extra), (0, 0), (0, 0))
                    ).transpose(0, 3, 1, 2)
    mask_t = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, extra), (0, 0), (0, 0))
                     ).transpose(0, 3, 1, 2)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    # the cotangent stages in ITS dtype — bf16 under the training default
    # (the Pallas forward emits x.dtype, so g arrives bf16): staging it to
    # f32 doubled the backward's largest input read for mantissa bits the
    # cotangent no longer carries. Kernels upcast per-use for f32 math.
    g = g if g.dtype == jnp.bfloat16 else g.astype(jnp.float32)
    g_blk_in = jnp.pad(g, ((0, 0), (0, extra), (0, 0), (0, 0)))
    dims = dict(b=b // pk, h=h, w=pk * w, w_img=w, pk=pk, cin=cin, cout=cout,
                pad_rows=pad_rows, r_blk=r_blk, h_pad=h_pad, x_dtype=x.dtype)
    return xt, off_t, mask_t, w_taps, g_blk_in, dims


def _bwd_params_call(xt, off_t, mask_t, w_taps, g_blk_in, dims, max_shift,
                     interpret):
    b, h, w, cin, cout = (dims[k] for k in ("b", "h", "w", "cin", "cout"))
    pad_rows, r_blk, h_pad = dims["pad_rows"], dims["r_blk"], dims["h_pad"]
    params_kernel = functools.partial(
        _dcn_bwd_params_kernel, h=h, w=w, w_img=dims["w_img"], cin=cin,
        cout=cout, pad_rows=pad_rows, max_shift=max_shift, row_block=r_blk,
    )
    doff_t, dmask_t, dw_b, dx_full = pl.pallas_call(
        params_kernel,
        grid=(b, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, h_pad + 2 * pad_rows, cin, w),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 18, r_blk, w), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, r_blk, w), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, cout), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 18, r_blk, w), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, r_blk, w), lambda i, r: (i, 0, r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, cin, cout), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_pad + 2 * pad_rows, w, cin),
                         lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 18, h_pad, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 9, h_pad, w), jnp.float32),
            jax.ShapeDtypeStruct((b, 9, cin, cout), jnp.float32),
            # dx leaves the kernel in the image dtype (bf16 under the
            # training default) — accumulation stays f32 in VMEM scratch
            jax.ShapeDtypeStruct((b, h_pad + 2 * pad_rows, w, cin),
                                 dims["x_dtype"]),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, cin, cout), jnp.float32),
            pltpu.VMEM((r_blk, cin, w), jnp.float32),
            pltpu.VMEM((h_pad + 2 * pad_rows, w, cin), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, off_t, mask_t, w_taps, g_blk_in)

    dx_t = dx_full[:, pad_rows:pad_rows + h_pad]
    return doff_t, dmask_t, dw_b, dx_t


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_bwd_lanes(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    g: jax.Array,
    max_shift: int = 14,
    interpret: bool = False,
):
    """Gradients of ``dcn_v2_pallas_lanes`` w.r.t. (x, offset, mask, weight,
    bias).

    Matches the analytic CUDA backward semantics (col2im / col2im_coord,
    src/cuda/dcn_v2_im2col_cuda.cu:197-330) under the same vertical-offset
    clamp as the Pallas forward. ONE fused source-centric kernel produces
    all gradients — the recomputed sampling weights and the per-tap
    ``gcol = g @ W_t^T`` are shared between (doffset, dmask, dweight) and
    the dx x-scatter, which accumulates into a VMEM-resident whole-image
    block revisited by every row-block program (TPU grid execution is
    sequential, so this replaces col2im's atomicAdd without partials).
    """
    h, cin = x.shape[1], x.shape[3]
    cout = weight.shape[3]
    xt, off_t, mask_t, w_taps, g_blk_in, dims = _bwd_stage(
        x, offset, mask, weight, g, max_shift)
    doff_t, dmask_t, dw_b, dx_t = _bwd_params_call(
        xt, off_t, mask_t, w_taps, g_blk_in, dims, max_shift, interpret)

    pk = dims["pk"]
    dx = _unpack_w(dx_t, pk)[:, :h].astype(x.dtype)
    doff = _unpack_w(doff_t.transpose(0, 2, 3, 1), pk)[:, :h]
    dmask = _unpack_w(dmask_t.transpose(0, 2, 3, 1), pk)[:, :h]
    dweight = dw_b.sum(axis=0).reshape(3, 3, cin, cout).astype(weight.dtype)
    dbias = g_blk_in[:, :h].astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, doff, dmask, dweight, dbias


# ---------------------------------------------------------------------------
# fused-offset-conv lanes generation
# ---------------------------------------------------------------------------
# The reference computes offsets/mask with a plain 3x3 conv over the SAME
# input the deformable conv samples (libs/DCNv2/dcn_v2.py:104-121). As a
# separate XLA conv that costs a second full read of x, a 27-channel f32
# HBM round-trip, channel-major staging transposes, and (27 < the 128-lane
# tile) ~21% MXU utilization — profiled at 8.2 ms of a 112 ms DLA train
# step across the neck's DCN layers. These kernels compute the offset conv
# IN-KERNEL from the already-resident W-on-lanes x (9 tiny (Cin, 27)
# matmuls + 2 one-hot lane-shift matmuls per row block), and the fused
# backward consumes d(offset)/d(mask) in-kernel, emitting dW_om / db_om /
# the offset-conv dx contribution directly — offsets and masks never touch
# HBM in either direction. The tap loops MIRROR _dcn_kernel /
# _dcn_bwd_params_kernel (keep them in sync when editing either).
#
# Scope: the lanes generation's native envelope only (W <= 128, Cin <= 512,
# 3x3 / s1 / p1 / d1); the module routes here for bfloat16 inputs (the
# in-kernel conv reads the bf16-staged x, so a float32 run keeps the exact
# unfused path). The vertical-offset clamp and all sampling semantics are
# identical to the unfused lanes kernels.


def _lane_edge_masks(wl: int, w_img: int):
    """(1, 1, W) float32 masks zeroing the lanes whose ±1 horizontal
    neighbor lies outside the (packed) image — the offset conv's zero
    padding, applied after a wrap-around ``pltpu.roll``. ``m_first`` kills
    values rolled INTO each image's first lane, ``m_last`` its last."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wl), 2)
    if wl == w_img:
        col = lane
    else:
        seg = jnp.floor((lane.astype(jnp.float32) + 0.5) * (1.0 / w_img)
                        ).astype(jnp.int32)
        col = lane - seg * w_img
    m_first = (col != 0).astype(jnp.float32)
    m_last = (col != w_img - 1).astype(jnp.float32)
    return m_first, m_last


def _om_block(xt_ref, omw_b, omb, r0, pad_rows, r_blk, cin, w, w_img):
    """The 3x3 offset conv for rows [r0, r0 + R) from the resident padded
    x: om[r, c, w'] = sum_taps W_om[t][cin, c] x[r + ti - 1, cin, w' + tj - 1]
    + b[c], computed as 9 R-batched (Cin, 27) MXU matmuls with the
    horizontal taps resolved by lane rolls + edge masks. Returns
    (R, 27, W) float32 (f32 accumulation of bf16 operands — the same
    arithmetic class as the XLA bf16 conv it replaces, without its
    output rounding)."""
    m_first, m_last = _lane_edge_masks(w, w_img)
    z = []
    for tj in range(3):
        acc = jnp.zeros((r_blk, 27, w), jnp.float32)
        for ti in range(3):
            srcr = xt_ref[0, pl.ds(r0 + pad_rows + ti - 1, r_blk)]
            wr = jnp.broadcast_to(omw_b[3 * ti + tj], (r_blk, cin, 27))
            acc = acc + jax.lax.dot_general(
                wr, srcr, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (R, 27, W)
        z.append(acc)
    om = (z[1]
          + pltpu.roll(z[0], 1, 2) * m_first
          # pltpu.roll requires a non-negative shift: -1 == w - 1
          + pltpu.roll(z[2], w - 1, 2) * m_last)
    return om + omb.reshape(1, 27, 1)


def _dcn_fused_kernel(xt_ref, omw_ref, omb_ref, w_ref, b_ref,
                      out_ref, stat_ref, *,
                      h: int, w: int, w_img: int, cin: int, cout: int,
                      pad_rows: int, max_shift: int, row_block: int):
    """Forward with the in-kernel offset conv. Tap loop mirrors
    ``_dcn_kernel`` (non-panel path); ``stat_ref`` (1, 1) receives this
    block's max |dy| so training can monitor clamp saturation without the
    offsets ever existing in HBM."""
    r_blk = row_block
    r0 = pl.program_id(1) * r_blk
    dmin, dmax = -max_shift - 2, max_shift + 2

    omw_b = omw_ref[...].astype(jnp.bfloat16)  # (9, Cin, 27)
    om = _om_block(xt_ref, omw_b, omb_ref[...], r0, pad_rows, r_blk,
                   cin, w, w_img)

    out_acc = jnp.zeros((r_blk, w, cout), jnp.float32)
    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)
    posf = pos.astype(jnp.float32)
    jgrid, seg_base = _seg_grids(r_blk, w, w_img)
    if seg_base is not None:
        posf = jnp.where((pos >= seg_base[:, None, :])
                         & (pos < seg_base[:, None, :] + w_img),
                         posf, 1e9)

    stat = jnp.zeros((), jnp.float32)
    for t in range(9):
        ti, tj = t // 3, t % 3
        # channel mapping follows the reference's concat(o1, o2) +
        # interleaved CUDA read (libs/DCNv2/dcn_v2.py:108-112 feeding
        # dcn_v2_im2col_cuda.cu:150-160): tap t reads dy at channel 2t,
        # dx at 2t+1 — o1/o2 are NOT per-kind blocks at the kernel level
        off_y_raw = om[:, 2 * t]
        stat = jnp.maximum(stat, jnp.max(jnp.abs(off_y_raw)))
        off_y = jnp.clip(off_y_raw, -max_shift, max_shift)
        off_x = om[:, 2 * t + 1]
        m = jax.nn.sigmoid(om[:, 18 + t])

        py = rgrid.astype(jnp.float32) + (ti - 1) + off_y
        px = jgrid.astype(jnp.float32) + (tj - 1) + off_x
        if seg_base is not None:
            px = px + seg_base.astype(jnp.float32)

        y0f = jnp.floor(py)
        fy = py - y0f
        y0 = y0f.astype(jnp.int32)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)

        hat = jnp.maximum(1.0 - jnp.abs(px[:, None, :] - posf), 0.0
                          ).astype(jnp.bfloat16)

        a0 = jnp.where(vy0, (1 - fy), 0.0) * m
        a1 = jnp.where(vy1, fy, 0.0) * m

        rel = y0 - rgrid
        need0 = a0 > 0.0
        need1 = a1 > 0.0
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)

        def shift_body(d, s):
            yw = ((rel == d).astype(jnp.float32) * a0
                  + (rel + 1 == d).astype(jnp.float32) * a1)
            src = xt_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]
            hsrc = jax.lax.dot_general(
                src, hat, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (R, Cin, W)
            return s + hsrc * yw[:, None, :]

        s = jax.lax.fori_loop(
            jnp.maximum(d_lo, dmin), jnp.minimum(d_hi, dmax) + 1, shift_body,
            jnp.zeros((r_blk, cin, w), jnp.float32),
        )

        out_acc = out_acc + jax.lax.dot_general(
            s.astype(jnp.bfloat16),
            w_ref[t].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    out_ref[0] = (out_acc + b_ref[0][None, None, :]).astype(out_ref.dtype)
    # (1, 1) vector store — Mosaic rejects scalar stores to VMEM
    stat_ref[0, 0] = jnp.reshape(stat, (1, 1))


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_lanes_fused(
    x: jax.Array,
    om_kernel: jax.Array,
    om_bias: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    max_shift: int = 14,
    interpret: bool | None = None,
):
    """Fused-offset-conv lanes forward: x (B,H,W,Cin) NHWC, om_kernel
    (3,3,Cin,27) HWIO (the reference ``conv_offset_mask`` layout: channels
    = 9 dy, 9 dx, 9 mask logits), om_bias (27,), weight (3,3,Cin,Cout).
    Returns ``(out (B,H,W,Cout) in x.dtype, max_abs_dy scalar f32)``."""
    interpret = _resolve_interpret(interpret)
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "pallas DCN kernel is 3x3 only"
    assert om_kernel.shape == (3, 3, cin, 27)
    assert w <= _LANES_NATIVE_MAX_W, "fused lanes kernel is native-width only"

    pad_rows = max_shift + 2
    r_blk = _row_block(h, cin, w)
    h_pad = -(-h // r_blk) * r_blk
    extra = h_pad - h

    pk = _pack_factor(b, w)
    w_img, wl, bp = w, pk * w, b // pk
    xq = _pack_w(x, pk)

    xt = jnp.pad(
        xq.astype(jnp.bfloat16),
        ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)
    omw = om_kernel.reshape(9, cin, 27).astype(jnp.float32)
    omb = om_bias.astype(jnp.float32).reshape(27, 1)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    bias_in = (bias if bias is not None
               else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)

    kernel = functools.partial(
        _dcn_fused_kernel, h=h, w=wl, w_img=w_img, cin=cin, cout=cout,
        pad_rows=pad_rows, max_shift=max_shift, row_block=r_blk,
    )
    n_rb = h_pad // r_blk
    out, stat = pl.pallas_call(
        kernel,
        grid=(bp, n_rb),
        in_specs=[
            pl.BlockSpec((1, h_pad + 2 * pad_rows, cin, wl),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, 27), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r_blk, wl, cout), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            # scalar monitor: Mosaic requires the block's last two dims to
            # be 8x128-tiled OR equal to the array's — trailing (1, 1)
            # array dims satisfy the latter for a per-block scalar
            pl.BlockSpec((1, 1, 1, 1), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, h_pad, wl, cout), x.dtype),
            jax.ShapeDtypeStruct((bp, n_rb, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, omw, omb, w_taps, bias_in)
    return _unpack_w(out, pk)[:, :h], jnp.max(stat)


def _dcn_fused_bwd_kernel(xt_ref, omw_ref, omw_cat_ref, omb_ref, w_ref,
                          g_ref,
                          dw_out_ref, dxp_ref, dwom_ref, dbom_ref,
                          dw_acc, s_acc, dx_acc, dwom_acc, dbom_acc,
                          *,
                          h: int, w: int, w_img: int, cin: int, cout: int,
                          pad_rows: int, max_shift: int, row_block: int):
    """Backward with the in-kernel offset conv: recomputes om, runs the
    ``_dcn_bwd_params_kernel`` tap loop (keep in sync) writing the
    per-pixel d(offset)/d(mask-logit) into a (27, R, W) scratch instead of
    HBM, then applies the offset conv's OWN backward in-kernel: db_om,
    per-tap dW_om (lane-shifted dz contractions), and the dx contribution
    ``conv_transpose(dz, W_om)`` accumulated into the same whole-image dx
    scratch the sampling gradient uses."""
    r_blk = row_block
    rb = pl.program_id(1)
    n_rb = pl.num_programs(1)
    r0 = rb * r_blk

    @pl.when(rb == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        dx_acc[:] = jnp.zeros_like(dx_acc)
        dwom_acc[:] = jnp.zeros_like(dwom_acc)
        dbom_acc[:] = jnp.zeros_like(dbom_acc)

    omw_b = omw_ref[...].astype(jnp.bfloat16)
    om = _om_block(xt_ref, omw_b, omb_ref[...], r0, pad_rows, r_blk,
                   cin, w, w_img)

    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    jgrid, seg_base = _seg_grids(r_blk, w, w_img)
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)
    g_blk = g_ref[0]  # (R, W, Cout)
    dz_parts = [None] * 27  # per-channel (R, W) d(om) planes

    for t in range(9):
        ti, tj = t // 3, t % 3
        # channel mapping: see _dcn_fused_kernel — dy at 2t, dx at 2t+1
        off_y_raw = om[:, 2 * t]
        off_y = jnp.clip(off_y_raw, -max_shift, max_shift)
        off_x = om[:, 2 * t + 1]
        m = jax.nn.sigmoid(om[:, 18 + t])

        py = rgrid.astype(jnp.float32) + (ti - 1) + off_y
        px = jgrid.astype(jnp.float32) + (tj - 1) + off_x
        y0f = jnp.floor(py)
        x0f = jnp.floor(px)
        fy = py - y0f
        fx = px - x0f
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        val00 = ((y0 >= 0) & (y0 <= h - 1) & (x0 >= 0) & (x0 <= w_img - 1)
                 ).astype(jnp.float32)
        val01 = ((y0 >= 0) & (y0 <= h - 1) & (x0 + 1 >= 0)
                 & (x0 + 1 <= w_img - 1)).astype(jnp.float32)
        val10 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1) & (x0 >= 0)
                 & (x0 <= w_img - 1)).astype(jnp.float32)
        val11 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1) & (x0 + 1 >= 0)
                 & (x0 + 1 <= w_img - 1)).astype(jnp.float32)

        x0c = jnp.clip(x0, 0, w_img - 1)
        x1c = jnp.clip(x0 + 1, 0, w_img - 1)
        if seg_base is not None:
            x0c = x0c + seg_base
            x1c = x1c + seg_base

        gcol = jax.lax.dot_general(
            g_blk.astype(jnp.bfloat16), w_ref[t].astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, W, Cin)

        rel = y0 - rgrid
        need0 = (val00 > 0) | (val01 > 0)
        need1 = (val10 > 0) | (val11 > 0)
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)

        s_acc[:] = jnp.zeros_like(s_acc)
        p0 = x0c[:, None, :] == pos
        p1 = x1c[:, None, :] == pos

        c00 = val00 * (1 - fy) * (1 - fx)
        c01 = val01 * (1 - fy) * fx
        c10 = val10 * fy * (1 - fx)
        c11 = val11 * fy * fx
        dy00 = -val00 * (1 - fx)
        dy01 = -val01 * fx
        dy10 = val10 * (1 - fx)
        dy11 = val11 * fx
        dxc00 = -val00 * (1 - fy)
        dxc01 = val01 * (1 - fy)
        dxc10 = -val10 * fy
        dxc11 = val11 * fy
        w00s, w01s, w10s, w11s = m * c00, m * c01, m * c10, m * c11
        gcol_b = gcol.astype(jnp.bfloat16)

        def shift_body(d, carry):
            dmask_t, doffy_t, doffx_t = carry
            sel0 = (rel == d).astype(jnp.float32)
            sel1 = (rel + 1 == d).astype(jnp.float32)
            a_w = sel0 * w00s + sel1 * w10s
            b_w = sel0 * w01s + sel1 * w11s
            s_w = (jnp.where(p0, a_w[:, None, :], 0.0)
                   + jnp.where(p1, b_w[:, None, :], 0.0)
                   ).astype(jnp.bfloat16)
            src = xt_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]  # (R, Cin, W)

            s_acc[:] = s_acc[:] + jax.lax.dot_general(
                src, s_w, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

            contrib = jax.lax.dot_general(
                s_w, gcol_b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wpos, Cin)
            row = r0 + pad_rows + d
            dx_acc[pl.ds(row, r_blk)] = (
                dx_acc[pl.ds(row, r_blk)] + contrib)

            e_mat = jax.lax.dot_general(
                src, gcol_b, (((1,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wsrc, W)
            e0 = jnp.sum(jnp.where(p0, e_mat, 0.0), axis=1)
            e1 = jnp.sum(jnp.where(p1, e_mat, 0.0), axis=1)
            dmask_t = dmask_t + (sel0 * (c00 * e0 + c01 * e1)
                                 + sel1 * (c10 * e0 + c11 * e1))
            doffy_t = doffy_t + (sel0 * (dy00 * e0 + dy01 * e1)
                                 + sel1 * (dy10 * e0 + dy11 * e1))
            doffx_t = doffx_t + (sel0 * (dxc00 * e0 + dxc01 * e1)
                                 + sel1 * (dxc10 * e0 + dxc11 * e1))
            return dmask_t, doffy_t, doffx_t

        zero_rw = jnp.zeros((r_blk, w), jnp.float32)
        dmask_t, doffy_t, doffx_t = jax.lax.fori_loop(
            jnp.maximum(d_lo, -max_shift - 2),
            jnp.minimum(d_hi, max_shift + 2) + 1,
            shift_body, (zero_rw, zero_rw, zero_rw))

        dw_r = jax.lax.dot_general(
            s_acc[:].astype(jnp.bfloat16), g_blk.astype(jnp.bfloat16),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (R, Cin, Cout)
        dw_acc[t] = dw_acc[t] + jnp.sum(dw_r, axis=0)

        # d(om): same gating as the unfused outputs (clamped dy rows get
        # zero; the mask row carries the sigmoid derivative); channel
        # mapping mirrors the forward read — dy at 2t, dx at 2t+1
        dz_parts[2 * t] = jnp.where(jnp.abs(off_y_raw) < max_shift,
                                    m * doffy_t, 0.0)
        dz_parts[2 * t + 1] = m * doffx_t
        dz_parts[18 + t] = dmask_t * m * (1.0 - m)

    # ---- offset conv backward, consuming dz in-kernel -------------------
    # (R, 27, W): channels on the second-minor dim so every contraction
    # below batches over R in the SAME operand position (Mosaic requires
    # aligned batch dims)
    dz = jnp.stack(dz_parts, axis=1)
    dbom_acc[...] = dbom_acc[...] + jnp.sum(dz, axis=(0, 2))[None, :]
    m_first, m_last = _lane_edge_masks(w, w_img)
    # dzs_all[r, tj*27 + c, w] = dz[r, c, w - (tj - 1)] — adjoint of the
    # forward's lane rolls (roll directions and edge masks swap roles).
    # The three tj variants concatenate into ONE (R, 81, W) operand so the
    # tap loop below collapses to 3 iterations over ti with 81-deep
    # contractions: a K=27 / N=27 matmul runs the MXU at ~21% lane
    # occupancy, K=81 / N=81 at ~63% — same MACs, a third of the passes.
    dzs_all = jnp.concatenate([
        pltpu.roll(dz, w - 1, 2) * m_last,
        dz,
        pltpu.roll(dz, 1, 2) * m_first,
    ], axis=1).astype(jnp.bfloat16)  # (R, 81, W)
    for ti in range(3):
        src = xt_ref[0, pl.ds(r0 + pad_rows + ti - 1, r_blk)]  # (R, Cin, W)
        # dW_om[ti][cin, tj*27+c] = sum_{r,w} src[r, cin, w] dzs_all[r, tj*27+c, w]
        dws = jax.lax.dot_general(
            src, dzs_all, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (R, Cin, 81)
        dwom_acc[ti] = dwom_acc[ti] + jnp.sum(dws, axis=0)
        # dx[r + ti - 1, w, cin] += sum_{tj,c} W_om[ti*3+tj][cin, c]
        #                                       dzs_all[r, tj*27+c, w]
        # omw_cat is pre-concatenated OUTSIDE the kernel — an in-kernel
        # lane concat at offsets 27/54 costs Mosaic lane shuffles that
        # regressed the Cin=256 shapes ~30%
        omw_ti = omw_cat_ref[ti].astype(jnp.bfloat16)  # (Cin, 81)
        u = jax.lax.dot_general(
            dzs_all, omw_ti, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (R, W, Cin)
        row = r0 + pad_rows + ti - 1
        dx_acc[pl.ds(row, r_blk)] = dx_acc[pl.ds(row, r_blk)] + u

    @pl.when(rb == n_rb - 1)
    def _finalize():
        dw_out_ref[0] = dw_acc[:]
        dxp_ref[0] = dx_acc[:].astype(dxp_ref.dtype)
        dwom_ref[0] = dwom_acc[:]
        dbom_ref[0] = dbom_acc[:]


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_bwd_lanes_fused(
    x: jax.Array,
    om_kernel: jax.Array,
    om_bias: jax.Array,
    weight: jax.Array,
    g: jax.Array,
    max_shift: int = 14,
    interpret: bool | None = None,
):
    """Gradients of ``dcn_v2_pallas_lanes_fused`` w.r.t.
    (x, om_kernel, om_bias, weight, bias) — the sampling gradients AND the
    offset conv's backward in one kernel; offsets/masks never exist in
    HBM. The stat output has no gradient (monitor only)."""
    interpret = _resolve_interpret(interpret)
    b, h, w, cin = x.shape
    cout = weight.shape[3]
    pad_rows = max_shift + 2
    r_blk = _row_block(h, max(cin, cout), w)
    h_pad = -(-h // r_blk) * r_blk
    extra = h_pad - h

    pk = _pack_factor(b, w)
    w_img, wl, bp = w, pk * w, b // pk
    xq = _pack_w(x, pk)
    gq = _pack_w(g, pk)

    xt = jnp.pad(
        xq.astype(jnp.bfloat16),
        ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)),
    ).transpose(0, 1, 3, 2)
    omw = om_kernel.reshape(9, cin, 27).astype(jnp.float32)
    # (3, Cin, 81) tj-concatenated layout for the in-kernel offset-conv
    # backward tail (see kernel comments) — built here where it's free
    omw_cat = (omw.reshape(3, 3, cin, 27).transpose(0, 2, 1, 3)
               .reshape(3, cin, 81))
    omb = om_bias.astype(jnp.float32).reshape(27, 1)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    gq = gq if gq.dtype == jnp.bfloat16 else gq.astype(jnp.float32)
    g_blk_in = jnp.pad(gq, ((0, 0), (0, extra), (0, 0), (0, 0)))

    kernel = functools.partial(
        _dcn_fused_bwd_kernel, h=h, w=wl, w_img=w_img, cin=cin, cout=cout,
        pad_rows=pad_rows, max_shift=max_shift, row_block=r_blk,
    )
    hp2 = h_pad + 2 * pad_rows
    dw_b, dx_full, dwom_b, dbom_b = pl.pallas_call(
        kernel,
        grid=(bp, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, hp2, cin, wl), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, 27), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, cin, 81), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((27, 1), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, wl, cout), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 9, cin, cout), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp2, wl, cin), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, cin, 81), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 27), lambda i, r: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 9, cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((bp, hp2, wl, cin), x.dtype),
            jax.ShapeDtypeStruct((bp, 3, cin, 81), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1, 27), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, cin, cout), jnp.float32),
            pltpu.VMEM((r_blk, cin, wl), jnp.float32),
            pltpu.VMEM((hp2, wl, cin), jnp.float32),
            pltpu.VMEM((3, cin, 81), jnp.float32),
            pltpu.VMEM((1, 27), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xt, omw, omw_cat, omb, w_taps, g_blk_in)

    dx_t = dx_full[:, pad_rows:pad_rows + h_pad]
    dx = _unpack_w(dx_t, pk)[:, :h].astype(x.dtype)
    dweight = dw_b.sum(axis=0).reshape(3, 3, cin, cout).astype(weight.dtype)
    # dwom comes out (3, Cin, 81) with the 81 axis = (tj, c) — undo the
    # tj-concatenation into the (ti, tj, Cin, 27) HWIO tap layout
    dom_k = (dwom_b.sum(axis=0).reshape(3, cin, 3, 27)
             .transpose(0, 2, 1, 3).astype(om_kernel.dtype))
    dom_b = dbom_b.sum(axis=(0, 1)).astype(om_bias.dtype)
    dbias = g_blk_in[:, :h].astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, dom_k, dom_b, dweight, dbias


# ===========================================================================
# NHWC one-hot "select" kernels ("select" generation — round 3)
# ===========================================================================
#
# The lanes kernels above resolve the horizontal sample position with a
# one-hot select MATMUL; this generation applies the same trick in the
# NATIVE NHWC layout, contracting the WIDTH dim instead of gathering along
# lanes: per (tap, y-shift) the whole row block samples with ONE batched
# matmul (R, Wdst, Wsrc) @ (R, Wsrc, Cin), so Cin stays on lanes end to
# end. Consequences vs the generations above:
#   * no staging transposes at all — x pads on H only; offset, mask, the
#     cotangent, and every output stay NHWC (the lanes generation's
#     W-on-lanes staging measured ~9% of the whole train step as layout
#     copies, BASELINE.md);
#   * no width or channel gates — any W (the select square is WxW), any
#     Cin (lane-tiled by Mosaic): no lane packing, no overlapping panels,
#     no Cin<=512 VMEM cliff;
#   * horizontal offsets are EXACT (unbounded), because a select row spans
#     the full width and out-of-bounds corners get zero weight — only the
#     vertical ``max_shift`` clamp remains (same semantics as "lanes"
#     at W<=128).
# The backward reuses the forward's modulated select matrix for BOTH the
# dW column accumulation and the dx scatter, and reads doffset/dmask off a
# corner-contraction matmul E = gcol . src^T — three batched MXU matmuls
# per (tap, shift), zero shuffles, mirroring the analytic col2im /
# col2im_coord semantics (src/cuda/dcn_v2_im2col_cuda.cu:197-330).


def _sel_row_block(h: int, w: int, cin: int) -> int:
    # working set per trip: (R, W, W) bf16 select + (R, W, Cin) f32
    # accumulator + the (R, W, Cin) matmul output
    per_row = 2 * w * w + 12 * w * cin
    budget = max((4 * 1024 * 1024) // max(per_row, 1), 8)
    for r in (32, 16, 8):
        if r <= budget and h % r == 0 and h >= r:
            return r
    return min(h, 8)


def _sel_stage(x, offset, mask, max_shift, row_block):
    """Pad x on H only (bf16) and the per-pixel operands to whole row
    blocks. Everything stays NHWC — no transposes."""
    b, h, w, cin = x.shape
    pad_rows = max_shift + 2
    h_pad = -(-h // row_block) * row_block
    extra = h_pad - h
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (pad_rows, pad_rows + extra), (0, 0), (0, 0)))
    off_p = jnp.pad(offset.astype(jnp.float32),
                    ((0, 0), (0, extra), (0, 0), (0, 0)))
    mask_p = jnp.pad(mask.astype(jnp.float32),
                     ((0, 0), (0, extra), (0, 0), (0, 0)))
    return xp, off_p, mask_p, pad_rows, h_pad


def _sel_geometry(off_ref, mask_ref, rgrid, jgrid, t, h, w, max_shift):
    """Per-tap sampling geometry: corner weights with validity folded in
    (REAL coordinates; only dy clamps), clipped corner columns, and the
    dynamic y-shift range."""
    ti, tj = t // 3, t % 3
    off_y_raw = off_ref[0, :, :, 2 * t]
    off_y = jnp.clip(off_y_raw, -max_shift, max_shift)
    off_x = off_ref[0, :, :, 2 * t + 1]
    m = mask_ref[0, :, :, t]
    py = rgrid.astype(jnp.float32) + (ti - 1) + off_y
    px = jgrid.astype(jnp.float32) + (tj - 1) + off_x
    y0f = jnp.floor(py)
    x0f = jnp.floor(px)
    fy = py - y0f
    fx = px - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    vy0 = (y0 >= 0) & (y0 <= h - 1)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 <= h - 1)
    vx0 = (x0 >= 0) & (x0 <= w - 1)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 <= w - 1)
    val = (vy0 & vx0, vy0 & vx1, vy1 & vx0, vy1 & vx1)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x0 + 1, 0, w - 1)
    rel = y0 - rgrid
    return off_y_raw, m, fy, fx, val, x0c, x1c, rel


def _sel_fwd_kernel(xp_ref, off_ref, mask_ref, w_ref, b_ref, out_ref, *,
                    h: int, w: int, cin: int, cout: int, pad_rows: int,
                    max_shift: int, row_block: int):
    """Program (i, r): image i, row block r. Layouts (all NHWC):
    xp_ref   (1, Hp+2P, W, Cin) bf16  H zero-padded
    off_ref  (1, R, W, 18) f32   (dy, dx) interleaved per tap
    mask_ref (1, R, W, 9)  f32   post-sigmoid modulation
    w_ref    (9, Cin, Cout) f32  tap-major kernel
    b_ref    (1, Cout) f32
    out_ref  (1, R, W, Cout) f32
    """
    r_blk = row_block
    r0 = pl.program_id(1) * r_blk
    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    jgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 1)
    # source-column index on dim 1 (SUBLANES): S[r, pos_src, jdst]. Keeping
    # jdst on lanes lets every (R, W) operand broadcast along sublanes for
    # free — indexing jdst on sublanes instead forces a lane->sublane
    # relayout of 8 operands per (tap, shift), measured 4-5x slower.
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)

    out_acc = jnp.zeros((r_blk * w, cout), jnp.float32)
    for t in range(9):
        _, m, fy, fx, val, x0c, x1c, rel = _sel_geometry(
            off_ref, mask_ref, rgrid, jgrid, t, h, w, max_shift)
        v00, v01, v10, v11 = val
        w00 = jnp.where(v00, (1 - fy) * (1 - fx) * m, 0.0)
        w01 = jnp.where(v01, (1 - fy) * fx * m, 0.0)
        w10 = jnp.where(v10, fy * (1 - fx) * m, 0.0)
        w11 = jnp.where(v11, fy * fx * m, 0.0)

        # shift range over NONZERO corner-row weights (see the lanes
        # forward): integer vertical sampling (fy == 0) visits one shift
        # per tap, and border/masked/padded pixels drop out. Bit-exact —
        # skipped shifts have all-zero select rows.
        need0 = (w00 > 0.0) | (w01 > 0.0)
        need1 = (w10 > 0.0) | (w11 > 0.0)
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)  # inclusive

        def shift_body(d, s):
            sel0 = (rel == d).astype(jnp.float32)
            sel1 = (rel + 1 == d).astype(jnp.float32)
            a_w = sel0 * w00 + sel1 * w10
            b_w = sel0 * w01 + sel1 * w11
            s_m = (jnp.where(x0c[:, None, :] == pos, a_w[:, None, :], 0.0)
                   + jnp.where(x1c[:, None, :] == pos, b_w[:, None, :], 0.0)
                   ).astype(jnp.bfloat16)  # (R, Wsrc, Wdst)
            src = xp_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]  # (R, Wsrc, C)
            # contract the shared SUBLANE dim Wsrc of both operands
            return s + jax.lax.dot_general(
                s_m, src, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (R, Wdst, Cin)

        s = jax.lax.fori_loop(
            jnp.maximum(d_lo, -max_shift - 2),
            jnp.minimum(d_hi, max_shift + 2) + 1, shift_body,
            jnp.zeros((r_blk, w, cin), jnp.float32))

        # (R*W, Cin) @ (Cin, Cout): Cin contracts on lanes — native MXU
        out_acc = out_acc + jax.lax.dot_general(
            s.reshape(r_blk * w, cin).astype(jnp.bfloat16),
            w_ref[t].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out_ref[0] = (out_acc.reshape(r_blk, w, cout) + b_ref[0][None, None, :]
                  ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_select(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    max_shift: int = 14,
    interpret: bool = False,
) -> jax.Array:
    """NHWC one-hot select DCNv2 forward (3x3 / s1 / p1 / d1, any W/Cin).

    Same operand contract as ``ops.dcn.dcn_v2``; only the VERTICAL offset
    clamps to ``max_shift`` (horizontal sampling is exact).
    Returns (B, H, W, Cout) in x.dtype (float32 accumulation).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "pallas DCN kernel is 3x3 only"
    assert offset.shape == (b, h, w, 18)
    assert mask.shape == (b, h, w, 9)

    r_blk = _sel_row_block(h, w, cin)
    xp, off_p, mask_p, pad_rows, h_pad = _sel_stage(
        x, offset, mask, max_shift, r_blk)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    bias_in = (bias if bias is not None
               else jnp.zeros((cout,), jnp.float32)).reshape(1, cout)

    kernel = functools.partial(
        _sel_fwd_kernel, h=h, w=w, cin=cin, cout=cout, pad_rows=pad_rows,
        max_shift=max_shift, row_block=r_blk)
    out = pl.pallas_call(
        kernel,
        grid=(b, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, h_pad + 2 * pad_rows, w, cin),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, 18), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, 9), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r_blk, w, cout),
                               lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w, cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, off_p, mask_p, w_taps, bias_in)
    return out[:, :h]


def _sel_bwd_kernel(xp_ref, off_ref, mask_ref, w_ref, g_ref,
                    doff_ref, dmask_ref, dw_out_ref, dxp_ref,
                    dw_acc, s_acc, dx_acc, *,
                    h: int, w: int, cin: int, cout: int, pad_rows: int,
                    max_shift: int, row_block: int):
    """All gradients in one NHWC pass — three batched MXU matmuls per
    (tap, shift), sharing one modulated select matrix s_w:
      s_acc   += s_w @ src       — modulated column m*u; dW[t] closes as
                 one (R*W)-contraction against the cotangent
      dx      += s_w^T-apply     — dot over Wdst scatters into the
                 whole-image dx block (VMEM-resident across the grid row;
                 sequential TPU grid -> no atomics)
      E        = gcol . src^T    — corner contraction (R, Wdst, Wsrc) from
                 which e0/e1 (-> dmask, doffset with the analytic bilinear
                 derivative coefficients) are one-hot row-reductions.
    """
    r_blk = row_block
    rb = pl.program_id(1)
    n_rb = pl.num_programs(1)
    r0 = rb * r_blk

    @pl.when(rb == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        # dx accumulates in f32 VMEM scratch and is written back once per
        # image in the output dtype (see the lanes backward)
        dx_acc[:] = jnp.zeros_like(dx_acc)

    rgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 0) + r0
    jgrid = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w), 1)
    # source column on SUBLANES (dim 1) — see the forward kernel's note
    pos = jax.lax.broadcasted_iota(jnp.int32, (r_blk, w, w), 1)
    g_blk = g_ref[0]  # (R, W, Cout)
    g2 = g_blk.reshape(r_blk * w, cout).astype(jnp.bfloat16)

    for t in range(9):
        off_y_raw, m, fy, fx, val, x0c, x1c, rel = _sel_geometry(
            off_ref, mask_ref, rgrid, jgrid, t, h, w, max_shift)
        v00 = val[0].astype(jnp.float32)
        v01 = val[1].astype(jnp.float32)
        v10 = val[2].astype(jnp.float32)
        v11 = val[3].astype(jnp.float32)

        # corner coefficients, all (R, W): u-combine (c**), bilinear-weight
        # y/x-derivative combos, and the modulated weights (w**s = m * c**)
        c00 = v00 * (1 - fy) * (1 - fx)
        c01 = v01 * (1 - fy) * fx
        c10 = v10 * fy * (1 - fx)
        c11 = v11 * fy * fx
        dy00 = -v00 * (1 - fx)
        dy01 = -v01 * fx
        dy10 = v10 * (1 - fx)
        dy11 = v11 * fx
        dxc00 = -v00 * (1 - fy)
        dxc01 = v01 * (1 - fy)
        dxc10 = -v10 * fy
        dxc11 = v11 * fy
        w00s, w01s, w10s, w11s = m * c00, m * c01, m * c10, m * c11

        # gcol = g @ W_t^T: contract Cout on lanes (native MXU)
        gcol = jax.lax.dot_general(
            g2, w_ref[t].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(r_blk, w, cin)
        gcol_b = gcol.astype(jnp.bfloat16)

        # validity-based shift bounds + hoisted one-hots: see the lanes
        # backward for the rationale (coords keep the fy == 0 corner, so
        # only border/padded rows drop; the x one-hots are shift-
        # independent booleans built once per tap)
        need0 = val[0] | val[1]
        need1 = val[2] | val[3]
        big = jnp.int32(32767)
        lo_e = jnp.where(need0, rel, jnp.where(need1, rel + 1, big))
        hi_e = jnp.where(need1, rel + 1, jnp.where(need0, rel, -big))
        d_lo = jnp.min(lo_e)
        d_hi = jnp.max(hi_e)  # inclusive
        s_acc[:] = jnp.zeros_like(s_acc)
        p0 = x0c[:, None, :] == pos
        p1 = x1c[:, None, :] == pos

        def shift_body(d, carry):
            dmask_t, doffy_t, doffx_t = carry
            sel0 = (rel == d).astype(jnp.float32)
            sel1 = (rel + 1 == d).astype(jnp.float32)
            a_w = sel0 * w00s + sel1 * w10s
            b_w = sel0 * w01s + sel1 * w11s
            s_m = (jnp.where(p0, a_w[:, None, :], 0.0)
                   + jnp.where(p1, b_w[:, None, :], 0.0)
                   ).astype(jnp.bfloat16)  # (R, Wsrc, Wdst)
            src = xp_ref[0, pl.ds(r0 + pad_rows + d, r_blk)]  # (R, Wsrc, C)

            # modulated column m*u for dW: contract the shared sublane
            # dim Wsrc
            s_acc[:] = s_acc[:] + jax.lax.dot_general(
                s_m, src, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)  # (R, Wdst, Cin)

            # dx: sources at shift d write input rows r0+d+[0,R); contract
            # the output column jdst
            contrib = jax.lax.dot_general(
                s_m, gcol_b, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wsrc, Cin)
            row = r0 + pad_rows + d
            dx_acc[pl.ds(row, r_blk)] = (
                dx_acc[pl.ds(row, r_blk)] + contrib)

            # corner contraction E[r, jsrc, jdst] = sum_c src . gcol
            e_mat = jax.lax.dot_general(
                src, gcol_b, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (R, Wsrc, Wdst)
            e0 = jnp.sum(jnp.where(p0, e_mat, 0.0), axis=1)
            e1 = jnp.sum(jnp.where(p1, e_mat, 0.0), axis=1)
            dmask_t = dmask_t + (sel0 * (c00 * e0 + c01 * e1)
                                 + sel1 * (c10 * e0 + c11 * e1))
            doffy_t = doffy_t + (sel0 * (dy00 * e0 + dy01 * e1)
                                 + sel1 * (dy10 * e0 + dy11 * e1))
            doffx_t = doffx_t + (sel0 * (dxc00 * e0 + dxc01 * e1)
                                 + sel1 * (dxc10 * e0 + dxc11 * e1))
            return dmask_t, doffy_t, doffx_t

        zero_rw = jnp.zeros((r_blk, w), jnp.float32)
        dmask_t, doffy_t, doffx_t = jax.lax.fori_loop(
            jnp.maximum(d_lo, -max_shift - 2),
            jnp.minimum(d_hi, max_shift + 2) + 1,
            shift_body, (zero_rw, zero_rw, zero_rw))

        # dW[t] += s^T @ g: contract the R*W rows on the MXU
        dw_acc[t] = dw_acc[t] + jax.lax.dot_general(
            s_acc[:].reshape(r_blk * w, cin).astype(jnp.bfloat16), g2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        dmask_ref[0, :, :, t] = dmask_t
        doff_y = m * doffy_t
        doff_x = m * doffx_t
        # clamp gate: saturated dy gets zero gradient (d clip = 0); dx is
        # unbounded in this generation, so no gate
        doff_ref[0, :, :, 2 * t] = jnp.where(
            jnp.abs(off_y_raw) < max_shift, doff_y, 0.0)
        doff_ref[0, :, :, 2 * t + 1] = doff_x

    @pl.when(rb == n_rb - 1)
    def _finalize():
        dw_out_ref[0] = dw_acc[:]
        dxp_ref[0] = dx_acc[:].astype(dxp_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_shift", "interpret"))
def dcn_v2_pallas_bwd_select(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    g: jax.Array,
    max_shift: int = 14,
    interpret: bool = False,
):
    """Gradients of ``dcn_v2_pallas_select`` w.r.t. (x, offset, mask,
    weight, bias) — analytic col2im / col2im_coord semantics
    (src/cuda/dcn_v2_im2col_cuda.cu:197-330) under the same vertical-only
    offset clamp as the forward. One fused kernel, any W/Cin."""
    b, h, w, cin = x.shape
    cout = weight.shape[3]
    r_blk = _sel_row_block(h, w, max(cin, cout))
    xp, off_p, mask_p, pad_rows, h_pad = _sel_stage(
        x, offset, mask, max_shift, r_blk)
    w_taps = weight.reshape(9, cin, cout).astype(jnp.float32)
    # cotangent stages in its own dtype (see the lanes backward)
    g_in = g if g.dtype == jnp.bfloat16 else g.astype(jnp.float32)
    g_p = jnp.pad(g_in, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))

    kernel = functools.partial(
        _sel_bwd_kernel, h=h, w=w, cin=cin, cout=cout, pad_rows=pad_rows,
        max_shift=max_shift, row_block=r_blk)
    hp2 = h_pad + 2 * pad_rows
    doff_p, dmask_p, dw_b, dxp = pl.pallas_call(
        kernel,
        grid=(b, h_pad // r_blk),
        in_specs=[
            pl.BlockSpec((1, hp2, w, cin),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, 18), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, 9), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, cout), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, r_blk, w, 18), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_blk, w, 9), lambda i, r: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, cin, cout), lambda i, r: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp2, w, cin),
                         lambda i, r: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_pad, w, 18), jnp.float32),
            jax.ShapeDtypeStruct((b, h_pad, w, 9), jnp.float32),
            jax.ShapeDtypeStruct((b, 9, cin, cout), jnp.float32),
            # dx leaves in the image dtype; f32 accumulation in scratch
            jax.ShapeDtypeStruct((b, hp2, w, cin), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((9, cin, cout), jnp.float32),
            pltpu.VMEM((r_blk, w, cin), jnp.float32),
            pltpu.VMEM((hp2, w, cin), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, off_p, mask_p, w_taps, g_p)

    dx = dxp[:, pad_rows:pad_rows + h].astype(x.dtype)
    doff = doff_p[:, :h]
    dmask = dmask_p[:, :h]
    dweight = dw_b.sum(axis=0).reshape(3, 3, cin, cout).astype(weight.dtype)
    dbias = g.astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, doff, dmask, dweight, dbias
