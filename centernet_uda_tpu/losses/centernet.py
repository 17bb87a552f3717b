"""CenterNet detection loss stack.

Functional JAX re-implementation of the reference loss module
(``losses/centernet.py``): CornerNet-style focal loss on the center heatmap
(:59-95), masked L1 regression on size/offset (:98-133), RAPiD periodic angle
loss (:192-223) and keypoint L1 + pairwise-distance loss (:136-189).

Layouts: heatmaps are NHWC; regression targets are gathered at the flat
``ind`` spatial indices (datasets/coco.py:211) via
``gather_features_nhwc``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from centernet_uda_tpu.ops.tensor import gather_features_nhwc, sigmoid_clamped


def focal_loss(pred: jax.Array, gt: jax.Array, weight: float = 1.0) -> jax.Array:
    """CornerNet-modified focal loss (losses/centernet.py:69-95).

    ``pred`` is the already-sigmoided heatmap in (0, 1); ``gt`` the gaussian
    target. Positives are pixels with ``gt == 1``; negatives are weighted by
    ``(1 - gt)^4``. Normalized by the positive count; if there are no
    positives the loss is the raw negative sum (losses/centernet.py:91-94).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    pos = (gt == 1.0).astype(jnp.float32)
    neg = (gt < 1.0).astype(jnp.float32)

    neg_weights = jnp.power(1.0 - gt, 4)

    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, 2) * pos
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, 2) * neg_weights * neg

    num_pos = pos.sum()
    pos_sum = pos_loss.sum()
    neg_sum = neg_loss.sum()

    loss = jnp.where(num_pos == 0, -neg_sum, -(pos_sum + neg_sum) / jnp.maximum(num_pos, 1.0))
    return loss * weight


def _masked_l1(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Sum-reduced L1 of masked pred/target, normalized by ``mask.sum()+1e-4``.

    The reference multiplies both operands by the broadcast mask and uses
    ``F.l1_loss(size_average=False) / (mask.sum() + 1e-4)``
    (losses/centernet.py:108-130); note the normalizer counts mask *elements*
    (num_objects x channels), not objects.
    """
    diff = jnp.abs(pred * mask - target * mask)
    return diff.sum() / (mask.sum() + 1e-4)


def reg_l1_loss(
    output: jax.Array,
    mask: jax.Array,
    ind: jax.Array,
    target: jax.Array,
    weight: float = 1.0,
    angle_weight: float = 1.0,
    pred: Optional[jax.Array] = None,
) -> jax.Array:
    """Masked L1 regression at gt center indices (losses/centernet.py:98-133).

    ``output`` NHWC (B, H, W, D); ``mask`` (B, K); ``ind`` (B, K);
    ``target`` (B, K, D). For D == 3 (rotated boxes, non-periodic) the last
    channel is an angle: the reference sigmoids **both** prediction and
    target angle (losses/centernet.py:114-117) — preserved here for parity —
    and adds it with ``angle_weight``. ``pred`` short-circuits the gather
    (the composite loss gathers all regression heads in one pass — tiny
    channel counts make per-head gathers relayout-bound on TPU).
    """
    if pred is None:
        pred = gather_features_nhwc(output.astype(jnp.float32), ind)
    m = jnp.broadcast_to(mask[..., None].astype(jnp.float32), pred.shape)
    target = target.astype(jnp.float32)

    if pred.shape[-1] == 3:
        # Both terms normalize by the full 3-channel mask sum
        # (losses/centernet.py:120,123). The masked entries of the angle term
        # contribute |sigmoid(0) - sigmoid(0)| = 0 because the reference masks
        # *before* the sigmoid (losses/centernet.py:108-109,114-117).
        norm = m.sum() + 1e-4
        wh_loss = jnp.abs(pred[..., 0:2] * m[..., 0:2]
                          - target[..., 0:2] * m[..., 0:2]).sum() / norm
        a_pred = sigmoid_clamped(pred[..., 2:3] * m[..., 2:3])
        a_tgt = sigmoid_clamped(target[..., 2:3] * m[..., 2:3])
        a_loss = jnp.abs(a_pred - a_tgt).sum() / norm
        return wh_loss * weight + a_loss * angle_weight

    return _masked_l1(pred, target, m) * weight


def periodic_reg_l1_loss(
    output: jax.Array,
    mask: jax.Array,
    ind: jax.Array,
    target: jax.Array,
    wh_weight: float = 1.0,
    angle_weight: float = 1.0,
    pred: Optional[jax.Array] = None,
) -> jax.Array:
    """RAPiD periodic angle loss (losses/centernet.py:192-223).

    Size channels use masked L1; the angle channel maps the prediction
    through ``sigmoid * 2pi - pi``, the target from degrees to radians, and
    penalizes ``|mod((d - pi/2), pi) - pi/2|``.
    """
    if pred is None:
        pred = gather_features_nhwc(output.astype(jnp.float32), ind)
    m = jnp.broadcast_to(mask[..., None].astype(jnp.float32), pred.shape)
    target = target.astype(jnp.float32)

    pred = pred * m
    target = target * m

    wh_loss = jnp.abs(pred[..., 0:2] - target[..., 0:2]).sum() / (m.sum() + 1e-4)

    pred_angle = sigmoid_clamped(pred[..., 2:3]) * 2.0 * math.pi - math.pi
    target_angle = jnp.deg2rad(target[..., 2:3])
    periodic = jnp.abs(
        jnp.mod((pred_angle - target_angle) - math.pi / 2.0, math.pi) - math.pi / 2.0
    )
    periodic_loss = periodic.sum() / (m.sum() + 1e-4)

    return wh_loss * wh_weight + periodic_loss * angle_weight


def kps_l1_loss(
    output: jax.Array,
    mask: jax.Array,
    ind: jax.Array,
    target: jax.Array,
    weight: float = 1.0,
    kp_indices: Optional[Sequence[Sequence[int]]] = None,
    distance_weight: float = 0.1,
    use_l1_distance: bool = False,
    legacy_sqrt_bias: bool = True,
    pred: Optional[jax.Array] = None,
) -> jax.Array:
    """Keypoint offset L1 + optional pairwise-distance consistency.

    Twin of ``KPSL1Loss`` (losses/centernet.py:136-189). ``mask`` here is the
    per-coordinate ``kp_reg_mask`` (B, K, 2P). The reference's L2 distance
    adds ``1e4`` inside the sqrt (losses/centernet.py:177-178) — almost
    certainly a typo for ``1e-4`` but it changes the trained-loss scale, so
    it is preserved behind ``legacy_sqrt_bias`` (True = reference-compatible).
    """
    if pred is None:
        pred = gather_features_nhwc(output.astype(jnp.float32), ind)
    m = mask.astype(jnp.float32)
    target = target.astype(jnp.float32)

    pred = pred * m
    target = target * m

    loss = jnp.abs(pred - target).sum() / (m.sum() + 1e-4)
    loss = loss * weight

    if kp_indices is not None:
        idx = jnp.asarray(kp_indices, dtype=jnp.int32)
        n, k2 = pred.shape[0], pred.shape[-1]
        p = pred.reshape(n, -1, k2 // 2, 2)
        t = target.reshape(n, -1, k2 // 2, 2)

        p_a, p_b = p[:, :, idx[:, 0], :], p[:, :, idx[:, 1], :]
        t_a, t_b = t[:, :, idx[:, 0], :], t[:, :, idx[:, 1], :]

        if use_l1_distance:
            pred_d = jnp.abs(p_a - p_b).sum(-1)
            tgt_d = jnp.abs(t_a - t_b).sum(-1)
        else:
            bias = 1e4 if legacy_sqrt_bias else 1e-4
            pred_d = jnp.sqrt(((p_a - p_b) ** 2).sum(-1) + bias)
            tgt_d = jnp.sqrt(((t_a - t_b) ** 2).sum(-1) + bias)

        dist_loss = jnp.abs(pred_d - tgt_d).sum() / (m.sum() + 1e-4)
        loss = loss + dist_loss * distance_weight

    return loss


@dataclass
class DetectionLoss:
    """Composite CenterNet loss (losses/centernet.py:7-56).

    ``__call__(outputs, batch) -> (loss, stats)`` where ``outputs`` is the
    backend head dict (NHWC, raw logits for ``hm``) and ``batch`` carries the
    encoded targets. Unlike the reference it does NOT mutate
    ``outputs['hm']``; decode applies its own sigmoid.
    """

    hm_weight: float = 1.0
    wh_weight: float = 0.1
    off_weight: float = 1.0
    kp_weight: Optional[float] = None
    angle_weight: float = 1.0
    periodic: bool = False
    kp_indices: Optional[Sequence[Sequence[int]]] = None
    kp_distance_weight: float = 0.1
    kp_distance_weight_l1: bool = False
    legacy_sqrt_bias: bool = field(default=True)

    @property
    def with_keypoints(self) -> bool:
        return self.kp_weight is not None or self.kp_indices is not None

    def __call__(
        self, outputs: Dict[str, jax.Array], batch: Dict[str, jax.Array]
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        hm_pred = sigmoid_clamped(outputs["hm"])
        hm_loss = focal_loss(hm_pred, batch["hm"], self.hm_weight)

        # ONE gather for every regression head at the shared ``ind``: the
        # per-head maps are 2-3 channels, and separate gathers each force a
        # pathological tiny-channel relayout pair (~0.2 ms/copy at 512px,
        # profiled). Concatenated in the merged-head channel order (sorted
        # names: kps < reg < wh, models/common.apply_merged_heads) so XLA
        # folds the concat back into one slice of the head conv output.
        parts = []
        if self.with_keypoints:
            parts.append(outputs["kps"])
        parts.extend([outputs["reg"], outputs["wh"]])
        cat = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
        gathered = gather_features_nhwc(cat.astype(jnp.float32), batch["ind"])
        d_wh = outputs["wh"].shape[-1]
        wh_pred = gathered[..., -d_wh:]
        reg_pred = gathered[..., -d_wh - 2:-d_wh]

        if self.periodic:
            wh_loss = periodic_reg_l1_loss(
                outputs["wh"], batch["reg_mask"], batch["ind"], batch["wh"],
                self.wh_weight, self.angle_weight, pred=wh_pred,
            )
        else:
            wh_loss = reg_l1_loss(
                outputs["wh"], batch["reg_mask"], batch["ind"], batch["wh"],
                self.wh_weight, self.angle_weight, pred=wh_pred,
            )

        off_loss = reg_l1_loss(
            outputs["reg"], batch["reg_mask"], batch["ind"], batch["reg"],
            self.off_weight, pred=reg_pred,
        )

        loss = hm_loss + wh_loss + off_loss
        stats = {"hm_loss": hm_loss, "wh_loss": wh_loss, "off_loss": off_loss}

        if self.with_keypoints:
            kp_loss = kps_l1_loss(
                outputs["kps"], batch["kp_reg_mask"], batch["ind"], batch["kps"],
                weight=self.kp_weight if self.kp_weight is not None else 1.0,
                kp_indices=self.kp_indices,
                distance_weight=self.kp_distance_weight,
                use_l1_distance=self.kp_distance_weight_l1,
                legacy_sqrt_bias=self.legacy_sqrt_bias,
                pred=gathered[..., :-d_wh - 2],
            )
            loss = loss + kp_loss
            stats["kp_loss"] = kp_loss

        stats["centernet_loss"] = loss
        return loss, stats
