"""DCNv2 correctness tests — the properties of the reference kernel tests
(libs/DCNv2/testcuda.py: zero-offset identity :32-67, gradcheck :69-97)
plus a from-scratch numpy golden implementation of the im2col semantics
(src/cuda/dcn_v2_im2col_cuda.cu:125-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.ops.dcn import DCN, dcn_v2


def np_dcn_v2(x, offset, mask, weight, bias, stride=1, padding=1, dilation=1):
    """Scalar-loop numpy oracle of modulated deformable conv (NHWC/HWIO)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    _, ho, wo, _ = mask.shape
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, py, px):
        if py <= -1 or py >= h or px <= -1 or px >= w:
            return np.zeros(cin)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        dy, dx = py - y0, px - x0
        val = np.zeros(cin)
        for (yy, xx, wgt) in [
            (y0, x0, (1 - dy) * (1 - dx)),
            (y0, x0 + 1, (1 - dy) * dx),
            (y0 + 1, x0, dy * (1 - dx)),
            (y0 + 1, x0 + 1, dy * dx),
        ]:
            if 0 <= yy < h and 0 <= xx < w:
                val += wgt * img[yy, xx]
        return val

    for bi in range(b):
        for yo in range(ho):
            for xo in range(wo):
                cols = np.zeros((k, cin))
                for ki in range(kh):
                    for kj in range(kw):
                        t = ki * kw + kj
                        py = yo * stride - padding + ki * dilation + \
                            offset[bi, yo, xo, 2 * t]
                        px = xo * stride - padding + kj * dilation + \
                            offset[bi, yo, xo, 2 * t + 1]
                        cols[t] = sample(x[bi], py, px) * mask[bi, yo, xo, t]
                out[bi, yo, xo] = (
                    cols.reshape(-1) @ weight.reshape(-1, cout) + bias
                )
    return out


@pytest.fixture
def small_inputs(rng):
    b, h, w, cin, cout = 2, 6, 7, 3, 4
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offset = (rng.randn(b, h, w, 18) * 1.5).astype(np.float32)
    mask = rng.rand(b, h, w, 9).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32)
    return x, offset, mask, weight, bias


def test_matches_numpy_golden(small_inputs):
    x, offset, mask, weight, bias = small_inputs
    got = np.asarray(
        dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
               jnp.asarray(weight), jnp.asarray(bias))
    )
    want = np_dcn_v2(x, offset, mask, weight, bias)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_zero_offset_equals_regular_conv(rng):
    """With zero offsets and mask=1, DCN == standard conv (the reference's
    zero-offset identity property, testcuda.py:32-67)."""
    b, h, w, cin, cout = 2, 8, 8, 4, 5
    x = rng.randn(b, h, w, cin).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    offset = np.zeros((b, h, w, 18), np.float32)
    mask = np.ones((b, h, w, 9), np.float32)

    got = np.asarray(
        dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
               jnp.asarray(weight), None)
    )
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_stride_two(rng):
    b, h, w, cin, cout = 1, 8, 8, 2, 3
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offset = (rng.randn(b, 4, 4, 18) * 0.7).astype(np.float32)
    mask = rng.rand(b, 4, 4, 9).astype(np.float32)
    weight = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2
    bias = np.zeros(cout, np.float32)
    got = np.asarray(
        dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
               jnp.asarray(weight), jnp.asarray(bias), stride=2)
    )
    want = np_dcn_v2(x, offset, mask, weight, bias, stride=2)
    assert got.shape == (1, 4, 4, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gradcheck(small_inputs):
    """check_grads on all differentiable inputs — the jax twin of
    torch.autograd.gradcheck (testcuda.py:69-97)."""
    x, offset, mask, weight, bias = small_inputs
    # shrink for the O(eps) finite-difference check
    from jax import enable_x64
    from jax.test_util import check_grads

    x, offset, mask = x[:1, :4, :4], offset[:1, :4, :4], mask[:1, :4, :4]

    def f(x_, o_, m_, w_, b_):
        return dcn_v2(x_, o_, m_, w_, b_).sum()

    with enable_x64():
        args = (jnp.asarray(x, jnp.float64),
                jnp.asarray(offset, jnp.float64) * 0.3,
                jnp.asarray(mask, jnp.float64),
                jnp.asarray(weight, jnp.float64),
                jnp.asarray(bias, jnp.float64))
        check_grads(f, args, order=1, modes=["rev"], atol=1e-3, rtol=1e-3)


def test_dcn_module_init_and_forward(rng):
    """DCN module: zero-init offset head => first forward == plain conv with
    sigmoid(0)=0.5 mask (testcuda.py zero-offset convention)."""
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    module = DCN(features=6)
    variables = module.init(jax.random.PRNGKey(0), x)

    # conv_offset_mask is zero-initialized (dcn_v2.py:119-121)
    com = variables["params"]["conv_offset_mask"]
    assert np.all(np.asarray(com["kernel"]) == 0)
    assert np.all(np.asarray(com["bias"]) == 0)

    out = module.apply(variables, x)
    want = 0.5 * jax.lax.conv_general_dilated(
        x, variables["params"]["weight"],
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + variables["params"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_dcn_module_jit_and_grad(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    module = DCN(features=6)
    variables = module.init(jax.random.PRNGKey(1), x)

    @jax.jit
    def loss(params, x_):
        return module.apply({"params": params}, x_).sum()

    grads = jax.grad(loss)(variables["params"], x)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # weight grad must be nonzero
    assert float(jnp.abs(grads["weight"]).sum()) > 0


def test_dcn_module_sows_offset_monitor(rng):
    """With the Pallas path active the module sows max |dy| for clamp
    monitoring (collected into step stats as ``dcn_max_abs_dy``)."""
    from unittest import mock

    import centernet_uda_tpu.ops.dcn as dcn_mod

    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    module = dcn_mod.DCN(features=8, use_pallas=True)

    orig = dcn_mod.dcn_v2

    def xla_only(*args, **kwargs):
        kwargs["use_pallas"] = False
        return orig(*args, **kwargs)

    with mock.patch.object(dcn_mod, "dcn_v2", xla_only):
        variables = module.init(jax.random.PRNGKey(0), x)
        _, state = module.apply(variables, x, mutable=["intermediates"])
    leaves = jax.tree.leaves(state["intermediates"])
    assert len(leaves) == 1
    # conv_offset_mask is zero-initialized -> zero offsets
    assert float(leaves[0]) == 0.0


def test_pallas_gate_envelope():
    """_pallas_supported covers exactly the documented per-generation
    envelope."""
    import jax.numpy as jnp

    from centernet_uda_tpu.ops import dcn_pallas
    from centernet_uda_tpu.ops.dcn import _pallas_supported

    def sup(w, cin, stride=1, k=3, h=8):
        x = jnp.zeros((1, h, w, cin))
        wgt = jnp.zeros((k, k, cin, 8))
        return _pallas_supported(x, wgt, stride, 1, 1)

    old = dcn_pallas.get_kernel_version()
    try:
        # default "auto": lanes envelope OR select envelope — every
        # reference backend shape (incl. MobileNetV2's 1280-ch head and
        # the 800px pyramid) is on SOME fused Pallas path
        dcn_pallas.set_kernel_version("auto")
        assert sup(8, 64) and sup(128, 64) and sup(200, 64)
        assert sup(16, 1280) and sup(4, 64) and sup(200, 64, h=200)
        assert not sup(512, 512, h=512)  # padded image exceeds VMEM
        assert not sup(64, 64, stride=2) and not sup(64, 64, k=5)

        dcn_pallas.set_kernel_version("lanes")
        assert sup(8, 64) and sup(128, 64) and sup(200, 64) and sup(1024, 64)
        assert not sup(4, 64)            # below the minimum width
        assert not sup(2000, 64)         # beyond the panel budget
        assert sup(16, 512)
        assert not sup(16, 1280)         # MobileNetV2 neck head: VMEM budget
        assert not sup(64, 64, stride=2)
        assert not sup(64, 64, k=5)

        dcn_pallas.set_kernel_version("select")
        # no width or channel special cases — only geometry + VMEM
        assert sup(4, 64) and sup(128, 64) and sup(200, 64)
        assert sup(16, 1280)             # MobileNetV2 neck head: fast path
        assert sup(16, 512) and sup(200, 64, h=200)
        assert not sup(512, 512, h=512)  # padded image exceeds VMEM
        assert not sup(64, 64, stride=2)
        assert not sup(64, 64, k=5)
    finally:
        dcn_pallas.set_kernel_version(old)


def test_slow_path_warnings(caplog):
    """Every DCN configuration that leaves the fast Pallas path must say so
    once at trace time (VERDICT r02: fallbacks were silent)."""
    import logging

    import flax.linen as nn_  # noqa: F401  (flax import side effects)

    from centernet_uda_tpu.ops import dcn as dcn_mod
    from centernet_uda_tpu.ops import dcn_pallas

    dcn_mod._SLOW_PATH_WARNED.clear()
    rng = jax.random.PRNGKey(0)
    old = dcn_pallas.get_kernel_version()

    try:
        # ----- default "auto": wide / deep maps route to select, so the
        # round-2 fallback shapes are all on a fused fast path (silent)
        dcn_pallas.set_kernel_version("auto")
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, jnp.zeros((1, 8, 8, 600), jnp.float32))
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, jnp.zeros((1, 8, 200, 16), jnp.float32))
        assert not caplog.records

        # ----- forced "lanes" generation fallbacks -----
        dcn_pallas.set_kernel_version("lanes")

        # Cin > 512 -> XLA fallback warning
        x_big = jnp.zeros((1, 8, 8, 600), jnp.float32)
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            dcn_mod.DCN(features=8, use_pallas=True).init(rng, x_big)
        assert any("Cin > 512" in r.message for r in caplog.records)
        caplog.clear()

        # W <= 256 is NATIVE lanes both directions since r05 (Mosaic
        # lane-tiles widths past 128) — no warning at W=200 ...
        x_wide = jnp.zeros((1, 8, 200, 16), jnp.float32)
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, x_wide)
        assert not caplog.records
        # ... but W > 256 -> panel-tiled forward, XLA backward warning. The
        # warning fires at trace time, so abstract evaluation is enough (the
        # wide Pallas kernel itself cannot lower on the CPU test backend).
        x_panel = jnp.zeros((1, 8, 300, 16), jnp.float32)
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, x_panel)
        assert any("backward differentiates through the XLA" in r.message
                   for r in caplog.records)
        caplog.clear()

        # unsupported geometry (5x5) while pallas requested
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            dcn_mod.DCN(features=8, kernel_size=(5, 5), padding=2,
                        use_pallas=True).init(rng, jnp.zeros((1, 8, 16, 8)))
        assert any("unsupported geometry" in r.message
                   for r in caplog.records)
        caplog.clear()

        # dedupe: same shape+reason warns only once
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            dcn_mod.DCN(features=8, use_pallas=True).init(rng, x_big)
        assert not any("Cin > 512" in r.message for r in caplog.records)

        # ----- "select" generation: no Cin/W fallbacks ... -----
        dcn_pallas.set_kernel_version("select")
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, x_big)
            jax.eval_shape(dcn_mod.DCN(features=8, use_pallas=True).init,
                           rng, x_wide)
        assert not caplog.records
        # ... but geometry outside 3x3/s1/p1/d1 still warns
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            dcn_mod.DCN(features=8, kernel_size=(5, 5), padding=2,
                        use_pallas=True).init(rng, jnp.zeros((1, 8, 18, 8)))
        assert any("select Pallas kernel envelope" in r.message
                   for r in caplog.records)
        caplog.clear()

        # XLA requested explicitly -> silent (not a fallback)
        with caplog.at_level(logging.WARNING,
                             logger="centernet_uda_tpu.ops.dcn"):
            dcn_mod.DCN(features=8, use_pallas=False).init(
                rng, jnp.zeros((1, 8, 8, 700)))
        assert not caplog.records
    finally:
        dcn_pallas.set_kernel_version(old)


def test_clamp_saturation_degrades_to_exact_xla():
    """Offsets AT the Pallas clamp trigger a runtime switch to the exact
    unbounded XLA path (VERDICT r03 #6): ``maybe_degrade_dcn`` flips the
    process default, rebuilds the jitted step functions, and the next step
    runs (and trains) on the XLA formulation."""
    import __graft_entry__ as ge
    import centernet_uda_tpu.ops.dcn as dcn_mod

    old = dcn_mod.get_pallas_default()
    try:
        # a run configured for the Pallas kernels (dcn_impl: pallas)
        dcn_mod.set_pallas_default("pallas")
        trainer = ge._build_trainer(batch_size=2, input_size=64)
        trainer.init_done()
        step_before = trainer._train_step

        # below the clamp: nothing happens
        assert not trainer.maybe_degrade_dcn(
            0.95 * dcn_mod.PALLAS_MAX_SHIFT)
        assert dcn_mod.get_pallas_default()
        assert trainer._train_step is step_before

        # monitored |dy| reaches the clamp -> degrade once
        assert trainer.maybe_degrade_dcn(float(dcn_mod.PALLAS_MAX_SHIFT))
        assert not dcn_mod.get_pallas_default()
        assert trainer._train_step is not step_before
        # idempotent: already on the exact path
        assert not trainer.maybe_degrade_dcn(100.0)

        # the rebuilt step retraces on the exact XLA path and trains
        out = trainer.step(ge._tiny_batch(2, 64), is_training=True)
        assert np.isfinite(float(out["stats"]["total_loss"]))
        # the XLA path sows no clamp monitor -> the stat disappears
        assert "dcn_max_abs_dy" not in out["stats"]
    finally:
        dcn_mod.set_pallas_default(old)


def test_eval_clamp_saturation_degrades_to_exact_xla(caplog):
    """VERDICT r04 #4: a test_only/eval run on the Pallas path with imported
    weights whose offsets exceed the clamp must degrade LOUDLY to the exact
    XLA path (reference sampling is unbounded,
    src/cuda/dcn_v2_im2col_cuda.cu:25-54), never truncate silently. The
    monitor is sown in eval forwards (uda/base.py::_apply_backend) and
    consumed by the validation loop (train.py::_run_phase)."""
    import logging

    import __graft_entry__ as ge
    import centernet_uda_tpu.ops.dcn as dcn_mod
    from centernet_uda_tpu.train import _run_phase

    old = dcn_mod.get_pallas_default()
    try:
        dcn_mod.set_pallas_default("pallas")
        trainer = ge._build_trainer(batch_size=2, input_size=64)
        trainer.init_done()

        # simulate imported weights with runaway learned offsets: push every
        # conv_offset_mask bias (offset channels included) past the clamp
        big = 3.0 * dcn_mod.PALLAS_MAX_SHIFT

        def boost(tree):
            out = {}
            for k, v in tree.items():
                if k == "conv_offset_mask" and isinstance(v, dict):
                    v = dict(v)
                    v["bias"] = jnp.full_like(v["bias"], big)
                    out[k] = v
                elif isinstance(v, dict):
                    out[k] = boost(v)
                else:
                    out[k] = v
            return out

        trainer.state = trainer.state.replace(
            params=boost(trainer.state.params))

        # 1) the eval step itself surfaces the monitor
        out = trainer.step(ge._tiny_batch(2, 64), is_training=False)
        assert "dcn_max_abs_dy" in out["stats"]
        assert float(out["stats"]["dcn_max_abs_dy"]) >= dcn_mod.PALLAS_MAX_SHIFT

        # 2) the validation loop degrades loudly and recomputes the batch
        with caplog.at_level(logging.ERROR,
                             logger="centernet_uda_tpu.uda.base"):
            stats = _run_phase(
                trainer, [ge._tiny_batch(2, 64)], [], None, {}, 1,
                "validation", is_training=False)
        assert not dcn_mod.get_pallas_default()  # switched to exact XLA
        assert any("AT the Pallas clamp" in r.message for r in caplog.records)
        assert "validation/total_loss" in stats
    finally:
        dcn_mod.set_pallas_default(old)
