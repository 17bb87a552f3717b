"""DLA-34 backend tests: structure, shapes, upsample parity with torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu import models
from centernet_uda_tpu.models.dla import DepthwiseUp, DLATrunk


def test_trunk_level_shapes():
    trunk = DLATrunk()
    x = jnp.zeros((1, 64, 64, 3))
    variables = trunk.init(jax.random.PRNGKey(0), x)
    feats = trunk.apply(variables, x)
    assert len(feats) == 6
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 64, 64, 16), (1, 32, 32, 32), (1, 16, 16, 64),
        (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512),
    ]


def test_dlaseg_head_contract():
    backend = models.build("dla", num_classes=4)
    assert backend.down_ratio == 4
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))
    out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                               train=False)
    assert set(out) == {"hm", "wh", "reg"}
    assert out["hm"].shape == (1, 16, 16, 4)
    assert out["wh"].shape == (1, 16, 16, 2)
    assert out["reg"].shape == (1, 16, 16, 2)


def test_hm_bias_init():
    backend = models.build("dla", num_classes=2)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))
    hm_bias = np.asarray(variables["params"]["hm_out"]["bias"])
    np.testing.assert_allclose(hm_bias, -2.19)
    wh_bias = np.asarray(variables["params"]["wh_out"]["bias"])
    np.testing.assert_allclose(wh_bias, 0.0)


@pytest.mark.parametrize("factor", [2, 4])
def test_depthwise_up_matches_torch(factor, rng):
    """Our lhs-dilated depthwise conv == torch ConvTranspose2d(groups=o)."""
    torch = pytest.importorskip("torch")

    o, hw = 3, 5
    x = rng.randn(1, hw, hw, o).astype(np.float32)
    module = DepthwiseUp(channels=o, factor=factor)
    variables = module.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize weights so the test is not bilinear-symmetric by accident
    w = rng.randn(*variables["params"]["kernel"].shape).astype(np.float32)
    out = module.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    # our HWIO (k,k,1,o) -> torch convT (in=o, out/groups=1, k, k)
    wt = torch.from_numpy(w.transpose(3, 2, 0, 1))
    want = torch.nn.functional.conv_transpose2d(
        xt, wt, stride=factor, padding=factor // 2, groups=o
    ).numpy().transpose(0, 2, 3, 1)

    assert out.shape == want.shape == (1, hw * factor, hw * factor, o)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_bilinear_init_upsamples_smoothly():
    """With the fill_up_weights init, a constant map stays (nearly) constant
    away from borders."""
    module = DepthwiseUp(channels=1, factor=2)
    x = jnp.ones((1, 6, 6, 1))
    variables = module.init(jax.random.PRNGKey(0), x)
    out = np.asarray(module.apply(variables, x))
    inner = out[0, 2:-2, 2:-2, 0]
    np.testing.assert_allclose(inner, 1.0, atol=1e-5)


def test_dla_train_step_grads():
    backend = models.build("dla", num_classes=2)
    variables = backend.init(jax.random.PRNGKey(0), (64, 64))

    def loss_fn(params):
        out, _ = backend.module.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.ones((1, 64, 64, 3)), train=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(v) for v in out.values())

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # deformable offsets start at zero but must receive gradient flow through
    # the DCN weight path
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0


def test_s2d_stem_matches_plain_stem():
    """The space-to-depth stem is an exact rewrite: identical param tree
    and identical outputs (float-assoc noise only) in eval and train."""
    from centernet_uda_tpu.models.dla import DLATrunk

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    t_plain = DLATrunk(stem_s2d=False)
    t_s2d = DLATrunk(stem_s2d=True)

    v = t_plain.init(jax.random.PRNGKey(0), x, train=False)
    v2 = t_s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree.map(lambda a: a.shape, v["params"])
            == jax.tree.map(lambda a: a.shape, v2["params"]))

    out_a = t_plain.apply(v, x, train=False)
    out_b = t_s2d.apply(v, x, train=False)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    out_a2, st_a = t_plain.apply(v, x, train=True, mutable=["batch_stats"])
    out_b2, st_b = t_s2d.apply(v, x, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(out_a2, out_b2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_s2d_base_conv_pack4_equals_pack2():
    """The 4x4-packed base conv (+ phase repack to the 2x2 layout) is an
    exact rewrite of the 2x2-packed one: same params, same output layout.
    Valid DLA inputs are multiples of 32, so the pack-4 route always
    applies in the trunk; this pins the two packings against each other
    directly (and thereby the pack-2 fallback for H,W % 4 != 0 sizes)."""
    from centernet_uda_tpu.models.dla import (
        _S2DConv, _repack4_to2, _s2d)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 36, 36, 3).astype(np.float32))
    m2 = _S2DConv(16, 7, 1, 3, pack=2)
    m4 = _S2DConv(16, 7, 1, 3, pack=4)
    v = m2.init(jax.random.PRNGKey(0), _s2d(x))
    out2 = m2.apply(v, _s2d(x))
    out4 = _repack4_to2(m4.apply(v, _s2d(x, 4)))
    assert out2.shape == out4.shape
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out4),
                               atol=1e-4)

    # the bench configuration runs the stem in bf16 — the packings must
    # also agree there (different grouping = different accumulation
    # order; tolerance at bf16 resolution)
    m2b = _S2DConv(16, 7, 1, 3, pack=2, dtype=jnp.bfloat16)
    m4b = _S2DConv(16, 7, 1, 3, pack=4, dtype=jnp.bfloat16)
    o2 = np.asarray(m2b.apply(v, _s2d(x)), np.float32)
    o4 = np.asarray(_repack4_to2(m4b.apply(v, _s2d(x, 4))), np.float32)
    scale = np.abs(o2).max()
    np.testing.assert_allclose(o2, o4, atol=0.05 * scale)


def test_dtype_threads_through_trunk():
    """Regression: DLASeg(dtype=bf16) must run the trunk in bf16 (a
    positional-arg slip once routed dtype into stem_s2d, silently running
    the whole trunk in f32)."""
    from centernet_uda_tpu.models.dla import DLASeg

    m = DLASeg(heads={"hm": 2, "wh": 2, "reg": 2}, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)

    y, st = m.apply(v, x, train=False, capture_intermediates=True,
                    mutable=["intermediates"])
    trunk_outs = st["intermediates"]["base"]["__call__"][0]
    assert all(o.dtype == jnp.bfloat16 for o in trunk_outs), \
        [o.dtype for o in trunk_outs]
    assert np.isfinite(np.asarray(y["hm"], np.float32)).all()


def test_pool_max_nonoverlap_matches_max_pool(rng):
    """Tree's downsample runs as reshape+reduce-max (identical forward to
    nn.max_pool at window == stride; the autodiff avoids XLA's slow
    select_and_scatter backward — models/dla.py:_pool_max_nonoverlap).
    Odd extents fall back to nn.max_pool."""
    import flax.linen as nn

    from centernet_uda_tpu.models.dla import _pool_max_nonoverlap

    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(_pool_max_nonoverlap(x, 2)),
        np.asarray(nn.max_pool(x, (2, 2), strides=(2, 2))))
    x_odd = jnp.asarray(rng.randn(2, 15, 16, 8).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(_pool_max_nonoverlap(x_odd, 2)),
        np.asarray(nn.max_pool(x_odd, (2, 2), strides=(2, 2))))
    # gradient flows and is finite (tie semantics documented in the helper)
    g = jax.grad(lambda x: jnp.sum(_pool_max_nonoverlap(x, 2) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()
