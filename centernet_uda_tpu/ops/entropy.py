"""Pixel-wise entropy map used by the ADVENT discriminator.

TPU twin of ``entropy_map`` (utils/image.py:121-124, after
github.com/valeoai/ADVENT): per-pixel, per-class weighted self-information
``-p * log2(p) / log2(C)`` over the softmax of the raw (pre-sigmoid) heatmap
logits. Note the reference normalizes by ``log2(C)`` but does **not** sum
over classes — the discriminator consumes the C-channel map directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def entropy_map(hm: jax.Array) -> jax.Array:
    """``hm`` NHWC logits -> NHWC weighted self-information map."""
    c = hm.shape[-1]
    probs = jax.nn.softmax(hm, axis=-1)
    return -(probs * jnp.log2(probs + 1e-30)) / math.log2(c)
