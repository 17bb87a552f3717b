"""Backend module tests: head contract, shapes, jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu import models


class TestResNet:
    @pytest.mark.parametrize("num_layers,rotated", [(18, False), (50, True)])
    def test_head_contract(self, num_layers, rotated):
        backend = models.build(
            "resnet", num_layers=num_layers, num_classes=4, rotated_boxes=rotated
        )
        assert backend.down_ratio == 4
        assert backend.rotated_boxes is rotated

        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert set(out) == {"hm", "wh", "reg"}
        assert out["hm"].shape == (1, 16, 16, 4)
        assert out["wh"].shape == (1, 16, 16, 3 if rotated else 2)
        assert out["reg"].shape == (1, 16, 16, 2)

    def test_keypoint_head(self):
        backend = models.build(
            "resnet", num_layers=18, num_classes=2, num_keypoints=5
        )
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert out["kps"].shape == (1, 16, 16, 10)

    def test_train_mode_updates_batch_stats(self):
        backend = models.build("resnet", num_layers=18, num_classes=2)
        variables = backend.init(jax.random.PRNGKey(0), (32, 32))
        out, new_state = backend.module.apply(
            variables, jnp.ones((2, 32, 32, 3)), train=True,
            mutable=["batch_stats"],
        )
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(new_state["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(old, new)
        )

    def test_jit_forward(self):
        backend = models.build("resnet", num_layers=18, num_classes=2)
        variables = backend.init(jax.random.PRNGKey(0), (32, 32))
        f = jax.jit(
            lambda v, x: backend.module.apply(v, x, train=False)
        )
        out = f(variables, jnp.zeros((1, 32, 32, 3)))
        assert out["hm"].shape == (1, 8, 8, 2)

    def test_unknown_layers_rejected(self):
        with pytest.raises(AssertionError):
            models.build("resnet", num_layers=77, num_classes=2)


def test_registry_unknown_backend():
    with pytest.raises(KeyError):
        models.build("vgg", num_classes=2)
