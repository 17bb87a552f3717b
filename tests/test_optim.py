"""Optimizer registry + per-epoch LR scheduler tests."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from centernet_uda_tpu.utils import optim as optim_util


def test_adam_with_weight_decay_maps_to_adamw():
    tx = optim_util.make_optimizer(
        "Adam", {"lr": 1e-3, "weight_decay": 1e-4}
    )
    params = {"w": jnp.ones((4,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    updates, _ = tx.update(grads, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_set_learning_rate_in_place():
    tx = optim_util.make_optimizer("Adam", {"lr": 1e-3})
    state = tx.init({"w": jnp.ones(3)})
    assert optim_util.get_learning_rate(state) == pytest.approx(1e-3)
    found = optim_util.set_learning_rate(state, 5e-4)
    assert found
    assert optim_util.get_learning_rate(state) == pytest.approx(5e-4)


def test_set_learning_rate_through_mask():
    mask = {"base": True, "head": False}
    tx = optim_util.make_optimizer("SGD", {"lr": 0.1, "momentum": 0.9},
                                   frozen_mask=mask)
    params = {"base": jnp.ones(2), "head": jnp.ones(2)}
    state = tx.init(params)
    assert optim_util.set_learning_rate(state, 0.01)
    assert optim_util.get_learning_rate(state) == pytest.approx(0.01)


def test_frozen_mask_zeroes_updates():
    mask = {"base": True, "head": False}
    tx = optim_util.make_optimizer("SGD", {"lr": 0.1}, frozen_mask=mask)
    params = {"base": jnp.ones(2), "head": jnp.ones(2)}
    state = tx.init(params)
    grads = {"base": jnp.ones(2), "head": jnp.ones(2)}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["base"]), 0.0)
    assert np.abs(np.asarray(updates["head"])).sum() > 0


class TestSchedulers:
    def test_multistep(self):
        s = optim_util.make_scheduler("MultiStepLR",
                                      {"milestones": [30, 60], "gamma": 0.1})
        assert s.factor(0) == 1.0
        assert s.factor(29) == 1.0
        assert s.factor(30) == pytest.approx(0.1)
        assert s.factor(60) == pytest.approx(0.01)

    def test_step(self):
        s = optim_util.make_scheduler("StepLR", {"step_size": 10, "gamma": 0.5})
        assert s.factor(9) == 1.0
        assert s.factor(10) == 0.5
        assert s.factor(25) == 0.25

    def test_exponential(self):
        s = optim_util.make_scheduler("ExponentialLR", {"gamma": 0.9})
        assert s.factor(2) == pytest.approx(0.81)

    def test_cosine(self):
        s = optim_util.make_scheduler("CosineAnnealingLR", {"T_max": 10})
        assert s.factor(0) == pytest.approx(1.0)
        assert s.factor(10) == pytest.approx(0.0, abs=1e-9)
        assert 0.4 < s.factor(5) < 0.6

    @pytest.mark.parametrize("t_max,eta_min,base_lr", [
        # the three reference configs that set eta_min
        (50, 1e-6, 2.5e-5),   # adversarial_entropy_minimization_dla.yaml:30-33
        (20, 1e-8, 5e-5),     # keypoints.yaml:38-41
        (10, 1e-7, 5e-5),     # coco_merged.yaml:111-114
    ])
    def test_cosine_eta_min_matches_torch(self, t_max, eta_min, base_lr):
        """Pin lr(epoch) against torch.optim.lr_scheduler.CosineAnnealingLR.

        The reference steps the scheduler once per epoch (uda/base.py:28-29);
        our ``lr(epoch, base_lr)`` must reproduce torch's schedule including
        the absolute ``eta_min`` floor, which a bare multiplier can't express.
        """
        torch = pytest.importorskip("torch")

        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=base_lr)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=t_max, eta_min=eta_min)
        ours = optim_util.make_scheduler(
            "CosineAnnealingLR", {"T_max": t_max, "eta_min": eta_min})
        # epoch 0 = initial lr; epoch e = after e scheduler steps
        for epoch in range(int(t_max * 1.5) + 1):
            torch_lr = opt.param_groups[0]["lr"]
            assert ours.lr(epoch, base_lr) == pytest.approx(
                torch_lr, rel=1e-6, abs=1e-12), f"epoch {epoch}"
            sched.step()
        # the floor is honored exactly at T_max
        assert ours.lr(t_max, base_lr) == pytest.approx(eta_min)

    def test_none(self):
        assert optim_util.make_scheduler(None) is None

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            optim_util.make_scheduler("OneCycleLR", {})
