"""UDA trainer tests: one train step per strategy on tiny shapes.

Gradient-semantics checks mirror the reference step choreography
(uda/entropy_minimization.py:29-33 two backwards == one summed backward;
uda/adversarial_entropy_minimization.py:77-152 dual optimizer)."""

import numpy as np
import pytest

import __graft_entry__ as ge


def run_one_step(uda_name, input_size=64, **uda_kwargs):
    from centernet_uda_tpu import losses as loss_registry
    from centernet_uda_tpu import models as model_registry
    from centernet_uda_tpu import uda as uda_registry
    from centernet_uda_tpu.config import Config

    backend = model_registry.build(
        "resnet", num_layers=18, num_classes=3, pretrained=False
    )
    trainer = uda_registry.build(uda_name, **uda_kwargs)
    trainer.backend = backend
    trainer.centernet_loss = loss_registry.build(
        "centernet.DetectionLoss", hm_weight=1.0, wh_weight=0.1, off_weight=1.0
    )
    trainer.cfg = Config({
        "seed": 0, "max_detections": 10,
        "datasets": {"training": {"params": {
            "input_size": [input_size, input_size]}}},
    })
    trainer.optimizer_cfg = {"name": "Adam", "params": {"lr": 1e-4}}
    trainer.init_done()

    batch = ge._tiny_batch(2, input_size, num_classes=3, with_target=True)
    out = trainer.step(batch, is_training=True)
    eval_out = trainer.step(batch, is_training=False)
    return trainer, out, eval_out


class TestEntropyMinimization:
    def test_step(self):
        trainer, out, eval_out = run_one_step(
            "EntropyMinimization", entropy_weight=0.01
        )
        stats = out["stats"]
        assert "entropy_loss" in stats and "centernet_loss" in stats
        total = float(stats["total_loss"])
        np.testing.assert_allclose(
            total,
            float(stats["centernet_loss"]) + 0.01 * float(stats["entropy_loss"]),
            rtol=1e-5,
        )
        # train steps return only stats (head tensors are dead in training);
        # the eval step still exposes both domains for decode
        assert "target_domain" in eval_out
        assert np.isfinite(total)


class TestMaxSquares:
    def test_step(self):
        trainer, out, _ = run_one_step(
            "MaxSquaresMinimization", max_squares_weight=0.3
        )
        stats = out["stats"]
        assert "max_square_loss" in stats
        # max-square loss is always negative (−mean(p²)/2)
        assert float(stats["max_square_loss"]) < 0
        assert np.isfinite(float(stats["total_loss"]))


class TestFDA:
    def test_step(self):
        trainer, out, _ = run_one_step(
            "FDA", entropy_weight=0.01, beta=0.05, eta=1.5
        )
        stats = out["stats"]
        assert "entropy_loss" in stats
        assert np.isfinite(float(stats["total_loss"]))

    def test_circular(self):
        trainer, out, _ = run_one_step(
            "FDA", entropy_weight=0.01, beta=0.05, use_circular=True
        )
        assert np.isfinite(float(out["stats"]["total_loss"]))


class TestAdvent:
    def test_step_updates_both_networks(self):
        import jax

        # the 5x stride-2 discriminator needs a heatmap of at least 32x32,
        # i.e. >= 128px input (at 512px the reference sees 128x128 maps)
        trainer, out, eval_out = run_one_step(
            "AdversarialEntropyMinimization", input_size=128,
            adversarial_weight=0.001,
            optimizer={"name": "Adam", "params": {"lr": 1e-3}},
        )
        stats = out["stats"]
        for key in ("dis_source", "dis_target", "dis_fool", "total_loss"):
            assert key in stats and np.isfinite(float(stats[key]))

        # discriminator params must have moved
        state = trainer.state
        assert state.disc_params is not None
        leaves = jax.tree.leaves(state.disc_params)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

        # second step keeps working (donated state round-trips)
        batch = ge._tiny_batch(2, 128, num_classes=3, with_target=True)
        out2 = trainer.step(batch, is_training=True)
        assert np.isfinite(float(out2["stats"]["total_loss"]))

    def test_discriminator_checkpoint(self, tmp_path):
        trainer, _, _ = run_one_step(
            "AdversarialEntropyMinimization", input_size=128,
            adversarial_weight=0.001,
        )
        path = tmp_path / "model_last.ckpt"
        trainer.save_model(str(path), epoch=1, with_optimizer=True)
        assert (tmp_path / "discriminator.ckpt").exists()
        # reload restores discriminator params
        start = trainer.load_model(str(path), resume=True)
        assert start == 2


def test_fda_mix_preserves_source_content():
    """beta=0 swaps (almost) nothing: output ~= source."""
    import jax.numpy as jnp

    from centernet_uda_tpu.ops.fda import fda_source_to_target

    rng = np.random.RandomState(0)
    src = rng.randn(1, 32, 32, 3).astype(np.float32)
    trg = rng.randn(1, 32, 32, 3).astype(np.float32)
    out = np.asarray(fda_source_to_target(jnp.asarray(src), jnp.asarray(trg),
                                          beta=0.0))
    np.testing.assert_allclose(out, src, atol=1e-4)
    # larger beta moves the image away from the source
    out2 = np.asarray(fda_source_to_target(jnp.asarray(src), jnp.asarray(trg),
                                           beta=0.3))
    assert np.abs(out2 - src).mean() > 1e-3
