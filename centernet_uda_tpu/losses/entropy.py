"""Entropy minimization loss (direct ADVENT variant).

Twin of ``EntropyLoss`` (losses/entropy.py:5-28). The softmax runs over the
class axis of the raw heatmap logits. With ``eta`` set it is the ADVENT
"entropy squared ^ eta" variant (per-pixel normalized entropy, squared,
raised to eta, mean); without it the plain normalized Shannon entropy summed
over everything and divided by ``n * h * w * log2(C)``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class EntropyLoss:
    eta: Optional[float] = None

    def __call__(
        self, outputs: Dict[str, jax.Array], batch=None
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        x = outputs["hm"].astype(jnp.float32)  # NHWC logits
        v = jax.nn.softmax(x, axis=-1)
        n, h, w, c = v.shape

        if self.eta is not None:
            ent = -(v * jnp.log2(v + 1e-30)).sum(axis=-1)  # (N, H, W)
            ent = ent / math.log2(c)
            ent = ent ** 2.0 + 1e-30
            ent = ent ** self.eta
            loss = ent.mean()
        else:
            loss = -(v * jnp.log2(v + 1e-30)).sum() / (n * h * w * math.log2(c))

        return loss, {"entropy_loss": loss}
