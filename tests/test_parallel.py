"""Multi-chip data-parallel tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from centernet_uda_tpu.parallel.mesh import MeshContext


@pytest.fixture(scope="module")
def n_devices():
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs the forced multi-device CPU mesh")
    return n


def test_mesh_context_shards_batch(n_devices):
    mesh = MeshContext.create()
    batch = {"x": np.zeros((n_devices * 2, 4, 4, 3), np.float32)}
    sharded = mesh.shard_batch(batch)
    shard_shapes = [
        s.data.shape for s in sharded["x"].addressable_shards
    ]
    assert all(s[0] == 2 for s in shard_shapes)
    assert len(shard_shapes) == n_devices


def test_dryrun_full_train_step(n_devices):
    ge.dryrun_multichip(n_devices)


def test_sharded_matches_single_device():
    """One sharded train step == one single-device step (same math)."""
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs multiple devices")
    batch_size = 2 * n

    params = dict(backend_name="resnet",
                  backend_params={"num_layers": 18, "num_classes": 6,
                                  "pretrained": False})
    t1 = ge._build_trainer(batch_size=batch_size, input_size=64, **params)
    t1.init_done()
    batch = ge._tiny_batch(batch_size, 64)
    out1 = t1.step(batch, is_training=True)

    t2 = ge._build_trainer(batch_size=batch_size, input_size=64, **params)
    t2.mesh = MeshContext.create()
    t2.init_done()
    out2 = t2.step(batch, is_training=True)

    np.testing.assert_allclose(
        float(out1["stats"]["total_loss"]),
        float(out2["stats"]["total_loss"]),
        rtol=1e-4,
    )
    # params after the step agree (global-batch BN + allreduced grads)
    p1 = jax.tree.leaves(t1.state.params)
    p2 = jax.tree.leaves(t2.state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grouped_batch_norm_matches_per_replica_stats():
    """bn_sync=replica (GroupedBatchNorm) must equal running nn.BatchNorm
    independently on each contiguous batch slice — DataParallel's per-GPU
    BN semantics (ref utils/helper.py:75-80)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from centernet_uda_tpu.models.common import GroupedBatchNorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 4, 4, 3).astype(np.float32))

    gbn = GroupedBatchNorm(groups=2, use_running_average=False)
    vars_g = gbn.init(jax.random.PRNGKey(0), x)
    out_g, upd = gbn.apply(vars_g, x, mutable=["batch_stats"])

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    vars_b = bn.init(jax.random.PRNGKey(0), x[:4])
    out_a, _ = bn.apply(vars_b, x[:4], mutable=["batch_stats"])
    out_b, _ = bn.apply(vars_b, x[4:], mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(out_g[:4]), np.asarray(out_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g[4:]), np.asarray(out_b),
                               atol=1e-5)

    # running stats pool to the exact global moments
    flat = np.asarray(x).reshape(-1, 3)
    want_mean = 0.1 * flat.mean(0)
    want_var = 1.0 * 0.9 + 0.1 * flat.var(0)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               want_mean, atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               want_var, atol=1e-5)


def test_bn_sync_flag_builds_and_trains():
    """bn_sync=replica end-to-end: one step trains with finite loss."""
    import __graft_entry__ as ge
    from centernet_uda_tpu.models import common as model_common

    model_common.set_bn_groups(2)
    try:
        t = ge._build_trainer(batch_size=4, input_size=64,
                              backend_name="resnet",
                              backend_params={"num_layers": 18,
                                              "num_classes": 6,
                                              "pretrained": False})
        t.init_done()
        batch = ge._tiny_batch(4, 64)
        out = t.step(batch, is_training=True)
        assert np.isfinite(float(out["stats"]["total_loss"]))
    finally:
        model_common.set_bn_groups(1)


def test_dla_sharded_step_matches_single_device():
    """The FLAGSHIP under the mesh: DLA-34 (space-to-depth stem + DCN
    custom paths; XLA DCN on the CPU test backend) sharded over all
    virtual devices computes the same step as single-device."""
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs multiple devices")
    batch_size = n  # one image per device keeps the CPU compile tractable

    params = dict(backend_name="dla",
                  backend_params={"num_classes": 3})
    t1 = ge._build_trainer(batch_size=batch_size, input_size=64, **params)
    t1.init_done()
    batch = ge._tiny_batch(batch_size, 64, num_classes=3)
    out1 = t1.step(batch, is_training=True)

    t2 = ge._build_trainer(batch_size=batch_size, input_size=64, **params)
    t2.mesh = MeshContext.create()
    t2.init_done()
    out2 = t2.step(batch, is_training=True)

    np.testing.assert_allclose(
        float(out1["stats"]["total_loss"]),
        float(out2["stats"]["total_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_advent_sharded_step():
    """ADVENT under the mesh: the dual-optimizer state (backend + disc)
    replicates, the sharded step matches single-device, and both
    optimizers' params advance identically."""
    n = jax.device_count()
    if n < 2:
        pytest.skip("needs multiple devices")
    # one image per device: the 5x stride-2 discriminator needs >= 128 px
    # inputs (below that its output is zero-size and every loss is NaN —
    # FCDiscriminator raises on it now)
    batch_size = n

    def build(mesh):
        t = ge._build_trainer(
            batch_size=batch_size, input_size=128, backend_name="resnet",
            backend_params={"num_layers": 18, "num_classes": 6,
                            "pretrained": False},
            uda="AdversarialEntropyMinimization",
            # small explicit disc lr: Adam's first step is ~sign(g)*lr, so
            # near-zero grads can flip sign between reduction orders — keep
            # 2*lr under the comparison atol (also covers the custom
            # disc-optimizer config path)
            uda_params={"adversarial_weight": 0.001,
                        "optimizer": {"name": "Adam",
                                      "params": {"lr": 2e-5}}},
        )
        if mesh:
            t.mesh = MeshContext.create()
        t.init_done()
        return t

    batch = ge._tiny_batch(batch_size, 128, with_target=True)

    t1 = build(mesh=False)
    out1 = t1.step(batch, is_training=True)
    t2 = build(mesh=True)
    out2 = t2.step(batch, is_training=True)

    for key in ("total_loss", "dis_source", "dis_target", "dis_fool"):
        # finite first: allclose(nan, nan) passes by default and would mask
        # a broken discriminator (this bit the round-3 suite)
        assert np.isfinite(float(out1["stats"][key])), key
        assert np.isfinite(float(out2["stats"][key])), key
        np.testing.assert_allclose(float(out1["stats"][key]),
                                   float(out2["stats"][key]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.state.disc_params),
                    jax.tree.leaves(t2.state.disc_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
