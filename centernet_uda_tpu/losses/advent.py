"""Adversarial (ADVENT) discriminator loss.

Twin of ``AdventLoss`` (losses/advent.py:5-18): binary cross-entropy with
logits of the discriminator output against a constant domain label
(source = 0, target = 1; uda/adversarial_entropy_minimization.py:19-20).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (numerically stable form)."""
    logits = logits.astype(jnp.float32)
    # log(1 + exp(-|x|)) + max(x, 0) - x * t
    return jnp.mean(
        jnp.clip(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@dataclass
class AdventLoss:
    def __call__(
        self, y_pred: jax.Array, y_true: float
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        target = jnp.full(y_pred.shape, float(y_true), dtype=jnp.float32)
        loss = bce_with_logits(y_pred, target)
        return loss, {"advent_loss": loss}
