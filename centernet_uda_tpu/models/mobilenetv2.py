"""CenterNet MobileNetV2 backend in Flax (NHWC).

From-scratch twin of ``backends/mobilenetv2.py``: a torchvision-compatible
MobileNetV2 (alpha=1.0) feature extractor (inverted residual bottlenecks,
ReLU6), the 3-stage deconv neck with optional DCNv2 before each deconv
(:133-166) and optional skip connections from feature layers 6 (32ch, /8)
and 13 (96ch, /16) added to the deconv outputs *pre-BN* — the reference's
flat-Sequential skip indices {0, 3} land on the raw ConvTranspose outputs
(:10-16, :95-118).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from centernet_uda_tpu.models.common import (
    Backend,
    CenterNetHeads,
    batch_norm,
    make_heads_dict,
)
from centernet_uda_tpu.ops.dcn import DCN

# torchvision mobilenet_v2 inverted-residual config: (expand, channels,
# repeats, stride)
_INVERTED_RESIDUAL_CFG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# deconv stage -> feature-extractor layer index (backends/mobilenetv2.py:10-16;
# the reference's flat indices {0, 3} are ConvTranspose outputs of stages 0, 1)
SKIP_MAPPING = {1: 6, 0: 13}
_FEATURE_CHANNELS = {6: 32, 13: 96}


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class InvertedResidual(nn.Module):
    expand: int
    out_channels: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        use_res = self.stride == 1 and cin == self.out_channels
        y = x
        idx = 0
        if self.expand != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"conv{idx}")(y)
            y = batch_norm(train, f"bn{idx}", self.dtype)(y)
            y = relu6(y)
            idx += 1
        # depthwise
        y = nn.Conv(hidden, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1)] * 2, feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype, name=f"conv{idx}")(y)
        y = batch_norm(train, f"bn{idx}", self.dtype)(y)
        y = relu6(y)
        idx += 1
        # project (linear)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name=f"conv{idx}")(y)
        y = batch_norm(train, f"bn{idx}", self.dtype)(y)
        return x + y if use_res else y


class MobileNetV2Trunk(nn.Module):
    """torchvision ``mobilenet_v2.features``: returns the 1280-ch map plus
    the per-layer feature dict used by the skip connections."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jax.Array, Dict[int, jax.Array]]:
        feats: Dict[int, jax.Array] = {}
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = batch_norm(train, "stem_bn", self.dtype)(x)
        x = relu6(x)
        layer_id = 1
        for expand, c, n, s in _INVERTED_RESIDUAL_CFG:
            for i in range(n):
                x = InvertedResidual(
                    expand, c, s if i == 0 else 1, self.dtype,
                    name=f"layer{layer_id}")(x, train=train)
                if layer_id in _FEATURE_CHANNELS:
                    feats[layer_id] = x
                layer_id += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = batch_norm(train, "head_bn", self.dtype)(x)
        x = relu6(x)
        return x, feats


class CenterMobileNetV2(nn.Module):
    heads: Dict[str, int]
    use_dcn: bool = False
    use_skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x, feats = MobileNetV2Trunk(self.dtype, name="base")(x, train=train)

        for stage in range(3):
            if self.use_dcn:
                x = DCN(256, dtype=self.dtype, name=f"neck_dcn{stage}")(x)
                x = batch_norm(train, f"neck_dcn_bn{stage}", self.dtype)(x)
                x = nn.relu(x)
            x = nn.ConvTranspose(256, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype,
                                 name=f"neck_deconv{stage}")(x)
            # skips are added to the raw deconv output, pre-BN
            # (backends/mobilenetv2.py:104-118 with flat indices 0 and 3)
            if self.use_skip and stage in SKIP_MAPPING:
                fe = feats[SKIP_MAPPING[stage]]
                sx = nn.Conv(256, (1, 1), use_bias=True, dtype=self.dtype,
                             name=f"skip_{stage}")(fe)
                x = sx + x
            x = batch_norm(train, f"neck_bn{stage}", self.dtype)(x)
            x = nn.relu(x)

        return CenterNetHeads(self.heads, head_conv=64, dtype=self.dtype,
                              name="heads")(x)


def build(num_classes, num_keypoints: int = 0, pretrained: Any = False,
          freeze_base: bool = False, use_dcn: bool = False,
          use_skip: bool = False, rotated_boxes: bool = False,
          dtype: Any = jnp.float32) -> Backend:
    """Factory matching backends/mobilenetv2.py:169-186."""
    heads = make_heads_dict(num_classes, num_keypoints, rotated_boxes)
    module = CenterMobileNetV2(heads=heads, use_dcn=use_dcn,
                               use_skip=use_skip, dtype=dtype)
    return Backend(
        module=module,
        down_ratio=4,
        rotated_boxes=rotated_boxes,
        num_classes=num_classes,
        num_keypoints=num_keypoints,
        heads=heads,
        name="mobilenetv2",
        extra={"freeze_base": freeze_base, "pretrained": pretrained},
    )
