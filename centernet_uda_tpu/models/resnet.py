"""CenterNet ResNet backend (ResNet-18/34/50/101/152) in Flax, NHWC.

From-scratch TPU re-implementation of the reference ResNet backend
(``backends/resnet.py``): a torchvision-compatible ResNet-v1 trunk (so the
``.pth`` weight-import shim can map state dicts 1:1), minus avgpool/fc
(backends/resnet.py:27-30), a 3-stage deconv neck to stride 4
(backends/resnet.py:75-100) and conv heads (backends/resnet.py:43-51).

``build`` mirrors the reference factory signature (backends/resnet.py:103-120)
including ``freeze_base`` — realized functionally by the trainer masking the
``base`` parameter subtree out of the optimizer rather than mutating
``requires_grad`` (backends/resnet.py:32-34).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from centernet_uda_tpu.models.common import (
    Backend,
    CenterNetHeads,
    DeconvNeck,
    batch_norm,
    make_heads_dict,
)

# num_layers -> (block, stage sizes, trunk output channels)
# (channel table twin of RESNET_MODELS, backends/resnet.py:6-12)
RESNET_CONFIGS = {
    18: ("basic", (2, 2, 2, 2), 512),
    34: ("basic", (3, 4, 6, 3), 512),
    50: ("bottleneck", (3, 4, 6, 3), 2048),
    101: ("bottleneck", (3, 4, 23, 3), 2048),
    152: ("bottleneck", (3, 8, 36, 3), 2048),
}


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = batch_norm(train, "bn2", self.dtype)(y)

        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = batch_norm(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output is filters * 4
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = batch_norm(train, "bn1", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = batch_norm(train, "bn2", self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = batch_norm(train, "bn3", self.dtype)(y)

        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = batch_norm(train, "downsample_bn", self.dtype)(residual)
        return nn.relu(y + residual)


class ResNetTrunk(nn.Module):
    """torchvision-compatible ResNet-v1 trunk, stride 32, NHWC."""

    block: str  # "basic" | "bottleneck"
    stage_sizes: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, "bn1", self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        filters = 64
        for stage, num_blocks in enumerate(self.stage_sizes):
            for i in range(num_blocks):
                stride = 2 if stage > 0 and i == 0 else 1
                x = block_cls(filters, stride, dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train=train)
            filters *= 2
        return x


class CenterResNet(nn.Module):
    """ResNet trunk + deconv neck + CenterNet heads (backends/resnet.py:15-71)."""

    num_layers: int
    heads: Dict[str, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        block, stages, _ = RESNET_CONFIGS[self.num_layers]
        x = ResNetTrunk(block, stages, dtype=self.dtype, name="base")(x, train=train)
        x = DeconvNeck(dtype=self.dtype, name="neck")(x, train=train)
        return CenterNetHeads(self.heads, dtype=self.dtype, name="heads")(x)


def build(
    num_layers: int,
    num_classes: int,
    num_keypoints: int = 0,
    pretrained: Any = False,
    freeze_base: bool = False,
    rotated_boxes: bool = False,
    dtype: Any = jnp.float32,
) -> Backend:
    """Factory matching the reference signature (backends/resnet.py:103-120).

    ``pretrained`` accepts False/None or a filesystem path to a torch
    ``.pth`` state dict (the hub download of the reference is replaced by an
    explicit local path — there is no network access on TPU pods by design).
    """
    assert num_layers in RESNET_CONFIGS, f"unsupported resnet{num_layers}"
    heads = make_heads_dict(num_classes, num_keypoints, rotated_boxes)
    module = CenterResNet(num_layers=num_layers, heads=heads, dtype=dtype)
    return Backend(
        module=module,
        down_ratio=4,
        rotated_boxes=rotated_boxes,
        num_classes=num_classes,
        num_keypoints=num_keypoints,
        heads=heads,
        name=f"resnet{num_layers}",
        extra={"freeze_base": freeze_base, "pretrained": pretrained},
    )
