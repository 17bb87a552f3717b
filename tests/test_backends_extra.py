"""MobileNetV2 + EfficientNet backend tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu import models


class TestMobileNetV2:
    def test_head_contract(self):
        backend = models.build("mobilenetv2", num_classes=4)
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert set(out) == {"hm", "wh", "reg"}
        assert out["hm"].shape == (1, 16, 16, 4)
        assert backend.down_ratio == 4

    def test_skip_and_dcn_variants(self):
        backend = models.build("mobilenetv2", num_classes=2, use_skip=True,
                               use_dcn=True)
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        params = variables["params"]
        assert "skip_0" in params and "skip_1" in params
        assert "neck_dcn0" in params
        out = backend.module.apply(variables, jnp.zeros((2, 64, 64, 3)),
                                   train=False)
        assert out["hm"].shape == (2, 16, 16, 2)

    def test_trunk_feature_channels(self):
        """Skip features must match the reference channel table (32@/8, 96@/16)."""
        from centernet_uda_tpu.models.mobilenetv2 import MobileNetV2Trunk

        trunk = MobileNetV2Trunk()
        x = jnp.zeros((1, 64, 64, 3))
        variables = trunk.init(jax.random.PRNGKey(0), x)
        feat, skips = trunk.apply(variables, x)
        assert feat.shape == (1, 2, 2, 1280)
        assert skips[6].shape == (1, 8, 8, 32)
        assert skips[13].shape == (1, 4, 4, 96)


class TestEfficientNet:
    def test_b0_head_contract(self):
        backend = models.build("efficientnet", num_classes=3, variant="b0")
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert out["hm"].shape == (1, 16, 16, 3)

    def test_b0_skip_shapes(self):
        """b0 skip blocks: block4 (40ch, /8) and block10 (112ch, /16)."""
        from centernet_uda_tpu.models.efficientnet import EfficientNetTrunk

        trunk = EfficientNetTrunk(variant="b0")
        x = jnp.zeros((1, 64, 64, 3))
        variables = trunk.init(jax.random.PRNGKey(0), x)
        feat, feats = trunk.apply(variables, x)
        assert feat.shape == (1, 2, 2, 1280)
        assert feats[4].shape == (1, 8, 8, 40)
        assert feats[10].shape == (1, 4, 4, 112)
        assert len(feats) == 16  # b0 expands to 16 blocks

    def test_b1_depth_scaling(self):
        from centernet_uda_tpu.models.efficientnet import EfficientNetTrunk

        trunk = EfficientNetTrunk(variant="b1")
        x = jnp.zeros((1, 32, 32, 3))
        variables = trunk.init(jax.random.PRNGKey(0), x)
        _, feats = trunk.apply(variables, x)
        assert len(feats) == 23  # ceil(1.1 * repeats) summed

    def test_keypoints_and_skip(self):
        backend = models.build("efficientnet", num_classes=2, variant="b0",
                               num_keypoints=5, use_skip=True)
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert out["kps"].shape == (1, 16, 16, 10)

    def test_drop_connect_rng(self):
        backend = models.build("efficientnet", num_classes=2, variant="b0")
        variables = backend.init(jax.random.PRNGKey(0), (32, 32))
        out, _ = backend.module.apply(
            variables, jnp.ones((2, 32, 32, 3)), train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
        )
        assert np.isfinite(np.asarray(out["hm"])).all()

    def test_unknown_variant_rejected(self):
        with pytest.raises(NotImplementedError):
            models.build("efficientnet", num_classes=2, variant="b9")

    def test_upsample_neck(self):
        backend = models.build("efficientnet", num_classes=2, variant="b0",
                               use_upsample=True)
        variables = backend.init(jax.random.PRNGKey(0), (64, 64))
        out = backend.module.apply(variables, jnp.zeros((1, 64, 64, 3)),
                                   train=False)
        assert out["hm"].shape == (1, 16, 16, 2)
