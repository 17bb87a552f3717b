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
