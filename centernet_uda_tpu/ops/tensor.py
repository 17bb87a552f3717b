"""Small tensor helpers shared by losses and decode.

TPU-native counterparts of the reference helpers in ``utils/tensor.py``
(`_sigmoid` at utils/tensor.py:5, `_gather_feat` at utils/tensor.py:10,
`_transpose_and_gather_feat` at utils/tensor.py:21). The rebuild uses NHWC
layout throughout (TPU conv-friendly), so the "transpose" of the reference
becomes a plain reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_clamped(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """Sigmoid clamped to [eps, 1-eps].

    Mirrors ``utils/tensor.py:5-7`` which clamps to [1e-4, 1-1e-4] so the
    focal loss logs never see exact 0/1.
    """
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


def gather_features(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """Gather rows of ``feat`` (B, N, C) at indices ``ind`` (B, K) -> (B, K, C).

    Equivalent to the reference ``_gather_feat`` (utils/tensor.py:10-19)
    without the optional mask path (masking is explicit in our losses).
    """
    ind = jnp.expand_dims(ind.astype(jnp.int32), axis=-1)
    return jnp.take_along_axis(feat, ind, axis=1)


def gather_features_nhwc(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """Gather per-pixel features at flattened spatial indices.

    ``feat`` is NHWC (B, H, W, C); ``ind`` (B, K) holds ``y * W + x`` flat
    indices (the dataset's ``ind`` encoding, datasets/coco.py:211). Returns
    (B, K, C). The reference needs an NCHW->NHWC permute first
    (``_transpose_and_gather_feat``, utils/tensor.py:21-25); in NHWC it is a
    free reshape.
    """
    b, h, w, c = feat.shape
    return gather_features(feat.reshape(b, h * w, c), ind)
