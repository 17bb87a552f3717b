"""Pallas DCN kernel tests (interpret mode on CPU; compiled path covered by
the TPU benchmarks).

Checks the fused shift-and-select kernel against the exact XLA formulation
within its documented envelope (3x3/s1/p1/d1, W<=128, vertical offsets
clamped to max_shift)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.ops.dcn import dcn_v2
from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas


def make_inputs(rng, b=2, h=16, w=16, cin=8, cout=8, off_scale=2.0):
    x = rng.randn(b, h, w, cin).astype(np.float32)
    off = (rng.randn(b, h, w, 18) * off_scale).astype(np.float32)
    m = rng.rand(b, h, w, 9).astype(np.float32)
    wgt = (rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)
    return tuple(jnp.asarray(v) for v in (x, off, m, wgt, bias))


def test_matches_xla_within_clamp(rng):
    x, off, m, wgt, bias = make_inputs(rng)
    want = np.asarray(dcn_v2(x, off, m, wgt, bias))
    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, interpret=True))
    # bf16 staging of the samples + bf16 MXU tap matmuls bound the error
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("b,w", [(4, 32), (4, 20)])
def test_lane_packed_small_maps(rng, b, w):
    """W < 128 maps pack several images per lane row (``_pack_factor``);
    forward and backward must still match the XLA reference, including a
    non-power-of-two width (the 800px eval pyramid has W=25/50/100)."""
    from centernet_uda_tpu.ops.dcn_pallas import _pack_factor, dcn_v2_pallas_bwd

    assert _pack_factor(b, w) > 1
    x, off, m, wgt, bias = make_inputs(rng, b=b, h=8, w=w, off_scale=1.5)
    want = np.asarray(dcn_v2(x, off, m, wgt, bias))
    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    g = jnp.asarray(rng.randn(*want.shape).astype(np.float32))
    offc = off.at[..., 0::2].set(jnp.clip(off[..., 0::2], -14, 14))
    want_grads = jax.grad(
        lambda *a: jnp.sum(dcn_v2(*a) * g), argnums=(0, 1, 2, 3, 4)
    )(x, offc, m, wgt, bias)
    got_grads = dcn_v2_pallas_bwd(x, off, m, wgt, g, interpret=True)
    for name, gw, gg in zip(("dx", "doff", "dmask", "dw", "db"),
                            want_grads, got_grads):
        # bf16 matmul noise scales with the gradient magnitude
        scale = max(1.0, float(np.abs(np.asarray(gw)).max()))
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=5e-2 * scale, rtol=5e-2,
                                   err_msg=name)


def test_zero_offsets_exact_structure(rng):
    x, _, m, wgt, bias = make_inputs(rng)
    off = jnp.zeros((2, 16, 16, 18), jnp.float32)
    want = np.asarray(dcn_v2(x, off, m, wgt, bias))
    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_vertical_clamp_semantics(rng):
    """Offsets beyond max_shift are clamped (documented deviation)."""
    x, _, m, wgt, bias = make_inputs(rng, off_scale=0.0)
    off = np.zeros((2, 16, 16, 18), np.float32)
    off[..., 0] = 100.0  # first tap dy far out of budget
    off = jnp.asarray(off)

    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, max_shift=4,
                                   interpret=True))
    # equivalent XLA result with the clamp applied manually
    off_c = np.asarray(off).copy()
    off_c[..., 0] = 4.0
    want = np.asarray(dcn_v2(x, jnp.asarray(off_c), m, wgt, bias))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_custom_vjp_backward_matches_clamped_xla(rng):
    """The fused backward == jax.vjp of the offset-clamped XLA ref."""
    from centernet_uda_tpu.ops.dcn import PALLAS_MAX_SHIFT
    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas_bwd

    x, off, m, wgt, bias = make_inputs(rng, b=1, h=8, w=8, cin=4, cout=4)
    g = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))

    grads = dcn_v2_pallas_bwd(x, off, m, wgt, g, interpret=True)
    assert len(grads) == 5
    assert all(np.isfinite(np.asarray(gr)).all() for gr in grads)

    def ref(x, off, m, wgt, bias):
        o = off.reshape(off.shape[:-1] + (9, 2))
        oy = jnp.clip(o[..., 0], -PALLAS_MAX_SHIFT, PALLAS_MAX_SHIFT)
        o = jnp.stack([oy, o[..., 1]], -1).reshape(off.shape)
        return dcn_v2(x, o, m, wgt, bias)

    _, vjp = jax.vjp(ref, x, off, m, wgt, bias)
    want = vjp(g)
    for got_g, want_g in zip(grads, want):
        # bf16 feature staging bounds the sampled-value-dependent grads
        np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                                   rtol=5e-2, atol=5e-2)


def test_unsupported_shapes_fall_back(rng):
    """dcn_v2(use_pallas=True) silently uses XLA outside the envelope."""
    b, h, w, cin, cout = 1, 9, 9, 4, 4
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    off = jnp.asarray((rng.randn(b, 5, 5, 18)).astype(np.float32))
    m = jnp.asarray(rng.rand(b, 5, 5, 9).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    # stride 2 is outside the Pallas envelope -> XLA path
    out_fast = dcn_v2(x, off, m, wgt, None, stride=2, use_pallas=True)
    out_ref = dcn_v2(x, off, m, wgt, None, stride=2, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-5)


def test_wide_map_panels(rng):
    """W > 128 (the 800px eval pyramid, W=200) tiles into overlapping
    panels; output must match the XLA reference with both offset clamps."""
    b, h, w, cin, cout = 1, 8, 140, 8, 8
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    off = jnp.asarray((rng.randn(b, h, w, 18) * 1.5).astype(np.float32))
    m = jnp.asarray(rng.rand(b, h, w, 9).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, cin, cout) * 0.1).astype(np.float32))
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))

    offc = off.reshape(b, h, w, 9, 2)
    offc = jnp.clip(offc, -14, 14).reshape(b, h, w, 18)
    want = np.asarray(dcn_v2(x, offc, m, wgt, bias))
    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_non_divisible_height(rng):
    """H not divisible by the row block (e.g. the 100-row maps of 800px
    eval) is padded internally and must still match the XLA op."""
    x, off, m, wgt, bias = make_inputs(rng, b=1, h=12, w=16, cin=8, cout=8,
                                       off_scale=1.0)
    want = np.asarray(dcn_v2(x, off, m, wgt, bias))
    got = np.asarray(dcn_v2_pallas(x, off, m, wgt, bias, interpret=True))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)

    # backward too
    from centernet_uda_tpu.ops.dcn import PALLAS_MAX_SHIFT
    from centernet_uda_tpu.ops.dcn_pallas import dcn_v2_pallas_bwd

    g = jnp.asarray(np.random.RandomState(3).randn(1, 12, 16, 8)
                    .astype(np.float32))
    grads = dcn_v2_pallas_bwd(x, off, m, wgt, g, interpret=True)

    def ref(x, off, m, wgt, bias):
        o = off.reshape(off.shape[:-1] + (9, 2))
        oy = jnp.clip(o[..., 0], -PALLAS_MAX_SHIFT, PALLAS_MAX_SHIFT)
        o = jnp.stack([oy, o[..., 1]], -1).reshape(off.shape)
        return dcn_v2(x, o, m, wgt, bias)

    _, vjp = jax.vjp(ref, x, off, m, wgt, bias)
    want_g = vjp(g)
    for a, b in zip(grads, want_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)
