"""Max-squares UDA loss.

Twin of ``MaxSquareLoss`` (losses/max_square.py:5-14):
``-mean(softmax(hm)^2) / 2`` over the class axis of the raw heatmap logits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclass
class MaxSquareLoss:
    def __call__(
        self, outputs: Dict[str, jax.Array], batch=None
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        v = jax.nn.softmax(outputs["hm"].astype(jnp.float32), axis=-1)
        loss = -jnp.mean(v ** 2) / 2.0
        return loss, {"max_square_loss": loss}
