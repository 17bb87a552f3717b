"""Pallas stem-conv kernel tests (interpret mode on CPU; device timings in
BASELINE.md). Covers the three packed-stem configurations
(models/dla.py:320-350): base 5x5, level0 3x3, level1 2x2 with asymmetric
padding — forward, dW, dx, and the custom_vjp wiring incl. the
``needs_dx=False`` zero-cotangent contract for the base conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.ops import conv_pallas as cp


CASES = [
    # (kh, kw, padding, cin, cout) — the packed stem configurations
    (5, 5, ((2, 2), (2, 2)), 12, 16),
    (3, 3, ((1, 1), (1, 1)), 8, 8),
    (2, 2, ((1, 0), (1, 0)), 8, 16),
]


def _inputs(rng, kh, kw, cin, cout, b=2, h=16, w=128):
    x = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32),
                    jnp.bfloat16)
    wt = jnp.asarray((rng.randn(kh, kw, cin, cout) * 0.1).astype(np.float32),
                     jnp.bfloat16)
    return x, wt


def _xla_conv(x, wt, padding):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), wt.astype(jnp.float32), (1, 1),
        list(padding), dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("kh,kw,padding,cin,cout", CASES)
def test_forward_matches_xla(rng, kh, kw, padding, cin, cout):
    x, wt = _inputs(rng, kh, kw, cin, cout)
    got = cp.conv2d_pallas_fwd(x, wt, padding=padding, interpret=True)
    want = _xla_conv(x, wt, padding)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("kh,kw,padding,cin,cout", CASES)
def test_backward_matches_xla(rng, kh, kw, padding, cin, cout):
    x, wt = _inputs(rng, kh, kw, cin, cout)
    g = jnp.asarray(
        rng.randn(2, 16, 128, cout).astype(np.float32), jnp.bfloat16)
    dw, dx = cp.conv2d_pallas_bwd(x, wt, g, padding=padding,
                                  needs_dx=True, interpret=True)

    def f(xx, ww):
        return jnp.vdot(_xla_conv(xx, ww, padding), g.astype(jnp.float32))

    dx_ref, dw_ref = jax.grad(f, argnums=(0, 1))(
        x.astype(jnp.float32), wt.astype(jnp.float32))
    for name, got, want in (("dw", dw, dw_ref), ("dx", dx, dx_ref)):
        want = np.asarray(want)
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   atol=5e-2 * scale, rtol=5e-2,
                                   err_msg=name)


def test_custom_vjp_and_needs_dx(rng, monkeypatch):
    """conv2d_pallas differentiates through the custom_vjp; with
    needs_dx=False the input cotangent is exactly zero (base-conv
    contract) while dW stays correct."""
    kh, kw, padding, cin, cout = CASES[0]
    x, wt = _inputs(rng, kh, kw, cin, cout)

    monkeypatch.setattr(cp, "conv2d_pallas_fwd",
                        functools_partial_interpret(cp.conv2d_pallas_fwd))
    monkeypatch.setattr(cp, "conv2d_pallas_bwd",
                        functools_partial_interpret(cp.conv2d_pallas_bwd))
    cp._conv_op.cache_clear()

    def loss(xx, ww, needs_dx):
        y = cp.conv2d_pallas(xx, ww, padding, needs_dx=needs_dx)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    dx1, dw1 = jax.grad(loss, argnums=(0, 1))(x, wt, True)
    dx0, dw0 = jax.grad(loss, argnums=(0, 1))(x, wt, False)
    cp._conv_op.cache_clear()

    def ref(xx, ww):
        return jnp.sum(_xla_conv(xx, ww, padding) ** 2)

    dx_ref, dw_ref = jax.grad(ref, argnums=(0, 1))(
        x.astype(jnp.float32), wt.astype(jnp.float32))
    scale = max(1.0, float(np.abs(np.asarray(dw_ref)).max()))
    np.testing.assert_allclose(np.asarray(dw1, np.float32),
                               np.asarray(dw_ref),
                               atol=5e-2 * scale, rtol=5e-2)
    np.testing.assert_allclose(np.asarray(dw0, np.float32),
                               np.asarray(dw1, np.float32), atol=1e-6)
    xscale = max(1.0, float(np.abs(np.asarray(dx_ref)).max()))
    np.testing.assert_allclose(np.asarray(dx1, np.float32),
                               np.asarray(dx_ref),
                               atol=5e-2 * xscale, rtol=5e-2)
    assert float(jnp.abs(dx0.astype(jnp.float32)).max()) == 0.0


def functools_partial_interpret(fn):
    def wrapped(*args, **kw):
        kw["interpret"] = True
        return fn(*args, **kw)
    return wrapped


def test_s2d_stem_routes_and_matches(rng, monkeypatch):
    """The _S2DConv module routes bf16 + pallas-default to the Pallas conv
    and matches its XLA path bitwise-closely (same packed weights)."""
    from centernet_uda_tpu.models.dla import _S2DConv
    from centernet_uda_tpu.ops import dcn as dcn_ops

    monkeypatch.setattr(cp, "conv2d_pallas_fwd",
                        functools_partial_interpret(cp.conv2d_pallas_fwd))
    cp._conv_op.cache_clear()
    # W=128 multiple + bf16 + pallas default => pallas path
    x = jnp.asarray(rng.randn(2, 16, 128, 12).astype(np.float32),
                    jnp.bfloat16)
    mod = _S2DConv(16, 7, 1, 3, dtype=jnp.bfloat16, needs_input_grad=False)
    params = mod.init(jax.random.PRNGKey(0), x)
    old = dcn_ops.get_pallas_default()
    try:
        dcn_ops.set_pallas_default(True)
        got = mod.apply(params, x)
    finally:
        dcn_ops.set_pallas_default(old)
        cp._conv_op.cache_clear()
    want = mod.apply(params, x)  # pallas default off -> XLA path
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=8e-2, rtol=8e-2)


def test_supported_envelope():
    x512 = jnp.zeros((16, 256, 256, 12), jnp.bfloat16)
    w = jnp.zeros((5, 5, 12, 64), jnp.bfloat16)
    assert cp.conv2d_pallas_supported(x512, w, (1, 1), ((2, 2), (2, 2)))
    # 800px eval -> packed W=400, not a lane multiple: XLA path
    x800 = jnp.zeros((4, 400, 400, 12), jnp.bfloat16)
    assert not cp.conv2d_pallas_supported(x800, w, (1, 1), ((2, 2), (2, 2)))
    # stride 2 unsupported
    assert not cp.conv2d_pallas_supported(x512, w, (2, 2), ((2, 2), (2, 2)))
