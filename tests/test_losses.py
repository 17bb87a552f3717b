"""Loss parity tests against independent numpy oracles.

Oracles re-derive the published formulas (CornerNet focal loss, masked L1,
RAPiD periodic angle loss) in plain numpy with the reference's exact
normalization conventions (losses/centernet.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from centernet_uda_tpu.losses import (
    AdventLoss,
    DetectionLoss,
    EntropyLoss,
    MaxSquareLoss,
    focal_loss,
    kps_l1_loss,
    periodic_reg_l1_loss,
    reg_l1_loss,
)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_sigmoid_clamped(x):
    return np.clip(np_sigmoid(x), 1e-4, 1 - 1e-4)


def np_focal(pred, gt, weight=1.0):
    pos = (gt == 1).astype(np.float64)
    neg = (gt < 1).astype(np.float64)
    neg_w = (1 - gt) ** 4
    pos_loss = (np.log(pred) * (1 - pred) ** 2 * pos).sum()
    neg_loss = (np.log(1 - pred) * pred ** 2 * neg_w * neg).sum()
    num_pos = pos.sum()
    if num_pos == 0:
        return -neg_loss * weight
    return -(pos_loss + neg_loss) / num_pos * weight


def gather(output, ind):
    b, h, w, c = output.shape
    flat = output.reshape(b, h * w, c)
    return np.stack([flat[i, ind[i]] for i in range(b)])


class TestFocal:
    def test_matches_oracle(self, rng):
        gt = np.zeros((2, 8, 8, 3), np.float32)
        gt[0, 2, 2, 1] = 1.0
        gt[1, 5, 5, 0] = 1.0
        gt[0, 3, 3, 1] = 0.6  # soft negative
        pred = np_sigmoid_clamped(rng.randn(2, 8, 8, 3)).astype(np.float32)
        got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt), weight=2.0))
        want = np_focal(pred.astype(np.float64), gt.astype(np.float64), 2.0)
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_no_positives_branch(self, rng):
        gt = np.zeros((1, 4, 4, 2), np.float32)
        pred = np_sigmoid_clamped(rng.randn(1, 4, 4, 2)).astype(np.float32)
        got = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt)))
        want = np_focal(pred.astype(np.float64), gt.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestRegL1:
    def test_2ch(self, rng):
        b, h, w, k = 2, 8, 8, 5
        output = rng.randn(b, h, w, 2).astype(np.float32)
        ind = rng.randint(0, h * w, (b, k))
        mask = (rng.rand(b, k) > 0.4).astype(np.float32)
        target = rng.randn(b, k, 2).astype(np.float32)

        got = float(reg_l1_loss(jnp.asarray(output), jnp.asarray(mask),
                                jnp.asarray(ind), jnp.asarray(target), weight=0.1))

        pred = gather(output, ind)
        m = np.repeat(mask[..., None], 2, axis=-1)
        want = np.abs(pred * m - target * m).sum() / (m.sum() + 1e-4) * 0.1
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_3ch_angle(self, rng):
        b, h, w, k = 1, 8, 8, 4
        output = rng.randn(b, h, w, 3).astype(np.float32)
        ind = rng.randint(0, h * w, (b, k))
        mask = np.array([[1, 1, 0, 1]], np.float32)
        target = rng.randn(b, k, 3).astype(np.float32)

        got = float(reg_l1_loss(jnp.asarray(output), jnp.asarray(mask),
                                jnp.asarray(ind), jnp.asarray(target),
                                weight=0.1, angle_weight=0.5))

        pred = gather(output, ind)
        m = np.repeat(mask[..., None], 3, axis=-1)
        pred = pred * m
        tgt = target * m
        norm = m.sum() + 1e-4
        wh = np.abs(pred[..., :2] - tgt[..., :2]).sum() / norm
        a = np.abs(np_sigmoid_clamped(pred[..., 2:]) -
                   np_sigmoid_clamped(tgt[..., 2:])).sum() / norm
        want = wh * 0.1 + a * 0.5
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestPeriodic:
    def test_matches_oracle(self, rng):
        b, h, w, k = 1, 8, 8, 3
        output = rng.randn(b, h, w, 3).astype(np.float32)
        ind = rng.randint(0, h * w, (b, k))
        mask = np.ones((b, k), np.float32)
        target = rng.randn(b, k, 3).astype(np.float32)
        target[..., 2] = rng.uniform(-90, 90, (b, k))  # degrees

        got = float(periodic_reg_l1_loss(
            jnp.asarray(output), jnp.asarray(mask), jnp.asarray(ind),
            jnp.asarray(target), wh_weight=0.1, angle_weight=1.0))

        pred = gather(output, ind)
        m = np.repeat(mask[..., None], 3, axis=-1)
        pred = pred * m
        tgt = target * m
        norm = m.sum() + 1e-4
        wh = np.abs(pred[..., :2] - tgt[..., :2]).sum() / norm
        pa = np_sigmoid_clamped(pred[..., 2:]) * 2 * math.pi - math.pi
        ta = np.deg2rad(tgt[..., 2:])
        per = np.abs(np.mod((pa - ta) - math.pi / 2, math.pi) - math.pi / 2)
        want = wh * 0.1 + per.sum() / norm
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_periodicity(self):
        """angle and angle+pi give identical loss (RAPiD periodic property)."""
        output = np.zeros((1, 4, 4, 3), np.float32)
        ind = np.zeros((1, 1), np.int64)
        mask = np.ones((1, 1), np.float32)
        t1 = np.array([[[0.0, 0.0, 30.0]]], np.float32)
        t2 = np.array([[[0.0, 0.0, 30.0 + 180.0]]], np.float32)
        l1 = float(periodic_reg_l1_loss(jnp.asarray(output), jnp.asarray(mask),
                                        jnp.asarray(ind), jnp.asarray(t1)))
        l2 = float(periodic_reg_l1_loss(jnp.asarray(output), jnp.asarray(mask),
                                        jnp.asarray(ind), jnp.asarray(t2)))
        np.testing.assert_allclose(l1, l2, atol=1e-5)


class TestKps:
    def test_l1_and_distance(self, rng):
        b, h, w, k, p = 1, 8, 8, 3, 4
        output = rng.randn(b, h, w, 2 * p).astype(np.float32)
        ind = rng.randint(0, h * w, (b, k))
        mask = (rng.rand(b, k, 2 * p) > 0.3).astype(np.float32)
        target = rng.randn(b, k, 2 * p).astype(np.float32)
        pairs = [[0, 1], [2, 3]]

        got = float(kps_l1_loss(jnp.asarray(output), jnp.asarray(mask),
                                jnp.asarray(ind), jnp.asarray(target),
                                weight=2.0, kp_indices=pairs,
                                distance_weight=0.1))

        pred = gather(output, ind) * mask
        tgt = target * mask
        norm = mask.sum() + 1e-4
        want = np.abs(pred - tgt).sum() / norm * 2.0
        pr = pred.reshape(b, k, p, 2)
        tr = tgt.reshape(b, k, p, 2)
        pairs = np.array(pairs)
        pd = np.sqrt((((pr[:, :, pairs[:, 0]] - pr[:, :, pairs[:, 1]]) ** 2)
                      .sum(-1)) + 1e4)
        td = np.sqrt((((tr[:, :, pairs[:, 0]] - tr[:, :, pairs[:, 1]]) ** 2)
                      .sum(-1)) + 1e4)
        want += np.abs(pd - td).sum() / norm * 0.1
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestComposite:
    def test_detection_loss_stats(self, rng):
        b, h, w, c, k = 2, 16, 16, 3, 5
        outputs = {
            "hm": jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)),
            "wh": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
            "reg": jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)),
        }
        hm_t = np.zeros((b, h, w, c), np.float32)
        hm_t[0, 4, 4, 0] = 1.0
        batch = {
            "hm": jnp.asarray(hm_t),
            "wh": jnp.asarray(rng.rand(b, k, 2).astype(np.float32) * 10),
            "reg": jnp.asarray(rng.rand(b, k, 2).astype(np.float32)),
            "ind": jnp.asarray(rng.randint(0, h * w, (b, k))),
            "reg_mask": jnp.asarray((rng.rand(b, k) > 0.5).astype(np.float32)),
        }
        loss_fn = DetectionLoss(hm_weight=1.0, wh_weight=0.1, off_weight=1.0)
        loss, stats = loss_fn(outputs, batch)
        assert set(stats) == {"hm_loss", "wh_loss", "off_loss", "centernet_loss"}
        np.testing.assert_allclose(
            float(loss),
            float(stats["hm_loss"]) + float(stats["wh_loss"]) + float(stats["off_loss"]),
            rtol=1e-6,
        )
        assert np.isfinite(float(loss))


class TestUdaLosses:
    def test_entropy_plain(self, rng):
        x = rng.randn(2, 8, 8, 4).astype(np.float32)
        loss, stats = EntropyLoss()({"hm": jnp.asarray(x)})
        e = np.exp(x - x.max(-1, keepdims=True))
        v = e / e.sum(-1, keepdims=True)
        want = -(v * np.log2(v + 1e-30)).sum() / (2 * 8 * 8 * math.log2(4))
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)
        assert "entropy_loss" in stats
        # uniform logits maximize entropy: loss == 1 (normalized)
        loss_u, _ = EntropyLoss()({"hm": jnp.zeros((1, 4, 4, 4))})
        np.testing.assert_allclose(float(loss_u), 1.0, atol=1e-5)

    def test_entropy_eta(self, rng):
        x = rng.randn(1, 4, 4, 3).astype(np.float32)
        loss, _ = EntropyLoss(eta=2.0)({"hm": jnp.asarray(x)})
        e = np.exp(x - x.max(-1, keepdims=True))
        v = e / e.sum(-1, keepdims=True)
        ent = -(v * np.log2(v + 1e-30)).sum(-1) / math.log2(3)
        want = ((ent ** 2 + 1e-30) ** 2.0).mean()
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_max_square(self, rng):
        x = rng.randn(2, 4, 4, 3).astype(np.float32)
        loss, _ = MaxSquareLoss()({"hm": jnp.asarray(x)})
        e = np.exp(x - x.max(-1, keepdims=True))
        v = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(float(loss), -np.mean(v ** 2) / 2, rtol=1e-5)

    def test_advent_bce(self, rng):
        logits = rng.randn(2, 4, 4, 1).astype(np.float32)
        loss, _ = AdventLoss()(jnp.asarray(logits), 1.0)
        p = np_sigmoid(logits.astype(np.float64))
        want = -np.mean(np.log(p))
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)
        loss0, _ = AdventLoss()(jnp.asarray(logits), 0.0)
        want0 = -np.mean(np.log(1 - p))
        np.testing.assert_allclose(float(loss0), want0, rtol=1e-4)
