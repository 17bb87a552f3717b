"""DLA-34 CenterNet backend with deformable-conv upsampling, in Flax (NHWC).

From-scratch TPU re-implementation of the reference DLA backend
(``backends/dla.py``): the Deep Layer Aggregation trunk (``BasicBlock`` :34,
``Root`` :150, recursive ``Tree`` :171, ``DLA`` :227, ``dla34`` config
levels [1,1,1,2,2,1] / channels [16,32,64,128,256,512] :313-316) and the
deformable upsampling neck (``DeformConv`` :351 = DCNv2 + BN + ReLU,
``IDAUp`` :375 with bilinear-initialized depthwise transposed-conv
upsampling ``fill_up_weights`` :339-348, ``DLAUp`` :403), composed by
``DLASeg`` :444 into trunk -> DLAUp -> IDAUp -> heads with the heatmap bias
initialized to -2.19 (:485,:493).

Module/attribute naming mirrors the torch state-dict structure so the
``.pth`` import shim (coco_dla_2x weights, configs/defaults.yaml:5) maps
keys 1:1. The DCNv2 op is the XLA/Pallas implementation in
``centernet_uda_tpu.ops.dcn`` instead of the CUDA extension.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from centernet_uda_tpu.models.common import (
    Backend,
    batch_norm,
    make_heads_dict,
)
from centernet_uda_tpu.ops.dcn import DCN

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


class DLABasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + residual (backends/dla.py:34-62)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3),
                      padding=[(self.dilation,) * 2] * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = batch_norm(train, "bn2", self.dtype)(out)
        return nn.relu(out + residual)


class Root(nn.Module):
    """1x1 conv over concatenated children (backends/dla.py:150-168)."""

    out_channels: int
    kernel_size: int = 1
    residual: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, *children, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = jnp.concatenate(children, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), padding=[(pad, pad)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, "bn", self.dtype)(x)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (backends/dla.py:171-224)."""

    levels: int
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim: int = 0
    root_kernel_size: int = 1
    dilation: int = 1
    root_residual: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        root_dim = self.root_dim
        if root_dim == 0:
            root_dim = 2 * self.out_channels
        if self.level_root:
            root_dim += self.in_channels
        self._root_dim = root_dim

        if self.levels == 1:
            self.tree1 = DLABasicBlock(
                self.out_channels, self.stride, self.dilation, self.dtype,
                name="tree1")
            self.tree2 = DLABasicBlock(
                self.out_channels, 1, self.dilation, self.dtype, name="tree2")
            self.root = Root(self.out_channels, self.root_kernel_size,
                             self.root_residual, self.dtype, name="root")
        else:
            self.tree1 = Tree(
                self.levels - 1, self.in_channels, self.out_channels,
                self.stride, root_dim=0,
                root_kernel_size=self.root_kernel_size,
                dilation=self.dilation, root_residual=self.root_residual,
                dtype=self.dtype, name="tree1")
            self.tree2 = Tree(
                self.levels - 1, self.out_channels, self.out_channels,
                root_dim=root_dim + self.out_channels,
                root_kernel_size=self.root_kernel_size,
                dilation=self.dilation, root_residual=self.root_residual,
                dtype=self.dtype, name="tree2")

        if self.in_channels != self.out_channels:
            self.project_conv = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                name="project_conv")
            self.project_bn = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="project_bn")
        else:
            self.project_conv = None
            self.project_bn = None

    def __call__(self, x, residual=None, children=None, train: bool = False):
        children = [] if children is None else children
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride,) * 2,
                                 strides=(self.stride,) * 2)
        else:
            bottom = x
        if self.project_conv is not None:
            residual = self.project_bn(
                self.project_conv(bottom), use_running_average=not train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual, train=train)
        if self.levels == 1:
            x2 = self.tree2(x1, train=train)
            out = self.root(x2, x1, *children, train=train)
        else:
            children.append(x1)
            out = self.tree2(x1, children=children, train=train)
        return out


class DLATrunk(nn.Module):
    """DLA classifier trunk returning all 6 level outputs (backends/dla.py:227-295)."""

    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        ch = self.channels
        x = nn.Conv(ch[0], (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                    dtype=self.dtype, name="base_conv")(x)
        x = batch_norm(train, "base_bn", self.dtype)(x)
        x = nn.relu(x)

        outputs = []

        # level0/level1: plain conv levels (backends/dla.py:277-287)
        def conv_level(x, planes, convs, stride, prefix):
            for i in range(convs):
                x = nn.Conv(planes, (3, 3),
                            strides=((stride if i == 0 else 1),) * 2,
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype, name=f"{prefix}_conv{i}")(x)
                x = batch_norm(train, f"{prefix}_bn{i}", self.dtype)(x)
                x = nn.relu(x)
            return x

        x = conv_level(x, ch[0], self.levels[0], 1, "level0")
        outputs.append(x)
        x = conv_level(x, ch[1], self.levels[1], 2, "level1")
        outputs.append(x)

        x = Tree(self.levels[2], ch[1], ch[2], 2, level_root=False,
                 dtype=self.dtype, name="level2")(x, train=train)
        outputs.append(x)
        x = Tree(self.levels[3], ch[2], ch[3], 2, level_root=True,
                 dtype=self.dtype, name="level3")(x, train=train)
        outputs.append(x)
        x = Tree(self.levels[4], ch[3], ch[4], 2, level_root=True,
                 dtype=self.dtype, name="level4")(x, train=train)
        outputs.append(x)
        x = Tree(self.levels[5], ch[4], ch[5], 2, level_root=True,
                 dtype=self.dtype, name="level5")(x, train=train)
        outputs.append(x)
        return outputs


def _bilinear_up_init(factor: int):
    """fill_up_weights bilinear kernel (backends/dla.py:339-348), HWIO
    (k, k, 1, channels)."""

    def init(key, shape, dtype=jnp.float32):
        k = shape[0]
        f = math.ceil(k / 2)
        c = (2 * f - 1 - f % 2) / (2.0 * f)
        w = np.zeros((k, k), np.float32)
        for i in range(k):
            for j in range(k):
                w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
        w = np.broadcast_to(w[:, :, None, None], shape)
        return jnp.asarray(w, dtype)

    return init


class DepthwiseUp(nn.Module):
    """Grouped (depthwise) transposed conv 2x/4x upsample.

    Twin of the ``nn.ConvTranspose2d(o, o, f*2, stride=f, padding=f//2,
    groups=o)`` in IDAUp (backends/dla.py:385-388). Lowered as a
    lhs-dilated depthwise convolution (the kernel is stored in torch's
    convT orientation and flipped here, so imported weights drop in)."""

    channels: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        k = 2 * f
        w = self.param("kernel", _bilinear_up_init(f), (k, k, 1, self.channels))
        pad = k - 1 - f // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w[::-1, ::-1].astype(self.dtype),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(f, f),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.channels,
        )


class DeformConv(nn.Module):
    """DCNv2 + BN + ReLU (backends/dla.py:351-372)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCN(self.features, dtype=self.dtype, name="conv")(x)
        x = batch_norm(train, "actf_bn", self.dtype)(x)
        return nn.relu(x)


class IDAUp(nn.Module):
    """Iterative deep aggregation upsampling (backends/dla.py:375-400).

    Functional version of the reference's in-place ``layers[i] = ...``
    updates: returns the updated list."""

    out_channels: int
    channels: Sequence[int]
    up_factors: Sequence[int]
    dtype: Any = jnp.float32

    def setup(self):
        projs, ups, nodes = [], [], []
        for i in range(1, len(self.channels)):
            f = int(self.up_factors[i])
            projs.append(DeformConv(self.out_channels, self.dtype,
                                    name=f"proj_{i}"))
            ups.append(DepthwiseUp(self.out_channels, f, self.dtype,
                                   name=f"up_{i}"))
            nodes.append(DeformConv(self.out_channels, self.dtype,
                                    name=f"node_{i}"))
        self.projs, self.ups, self.nodes = projs, ups, nodes

    def __call__(self, layers: List[jax.Array], startp: int, endp: int,
                 train: bool = False) -> List[jax.Array]:
        layers = list(layers)
        for i in range(startp + 1, endp):
            j = i - startp - 1
            x = self.projs[j](layers[i], train=train)
            x = self.ups[j](x)
            layers[i] = self.nodes[j](x + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Pyramid of IDAUp stages (backends/dla.py:403-426)."""

    startp: int
    channels: Sequence[int]
    scales: Sequence[int]
    dtype: Any = jnp.float32

    def setup(self):
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)
        idas = []
        for i in range(len(channels) - 1):
            j = -i - 2
            idas.append(IDAUp(
                channels[j], tuple(in_channels[j:]),
                tuple((scales[j:] // scales[j]).tolist()),
                self.dtype, name=f"ida_{i}"))
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j] for _ in channels[j + 1:]]
        self.idas = idas

    def __call__(self, layers: List[jax.Array], train: bool = False
                 ) -> List[jax.Array]:
        layers = list(layers)
        out = [layers[-1]]
        for i in range(len(layers) - self.startp - 1):
            layers = self.idas[i](layers, len(layers) - i - 2, len(layers),
                                  train=train)
            out.insert(0, layers[-1])
        return out


class DLASeg(nn.Module):
    """Full DLA-34 CenterNet model (backends/dla.py:444-510)."""

    heads: Dict[str, int]
    down_ratio: int = 4
    final_kernel: int = 1
    last_level: int = 5
    head_conv: int = 256
    levels: Sequence[int] = DLA34_LEVELS
    channels: Sequence[int] = DLA34_CHANNELS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        assert self.down_ratio in (2, 4, 8, 16)
        first_level = int(math.log2(self.down_ratio))
        channels = list(self.channels)

        feats = DLATrunk(self.levels, self.channels, self.dtype,
                         name="base")(x, train=train)

        scales = [2 ** i for i in range(len(channels[first_level:]))]
        feats = DLAUp(first_level, tuple(channels[first_level:]),
                      tuple(scales), self.dtype,
                      name="dla_up")(feats, train=train)

        y = list(feats[: self.last_level - first_level])
        y = IDAUp(
            channels[first_level],
            tuple(channels[first_level: self.last_level]),
            tuple(2 ** i for i in range(self.last_level - first_level)),
            self.dtype, name="ida_up",
        )(y, 0, len(y), train=train)
        feat = y[-1]

        out = {}
        for head in sorted(self.heads):
            classes = self.heads[head]
            z = nn.Conv(self.head_conv, (3, 3), padding=[(1, 1)] * 2,
                        use_bias=True, dtype=self.dtype,
                        name=f"{head}_conv")(feat)
            z = nn.relu(z)
            bias_init = (nn.initializers.constant(-2.19) if "hm" in head
                         else nn.initializers.zeros)
            pad = self.final_kernel // 2
            z = nn.Conv(classes, (self.final_kernel,) * 2,
                        padding=[(pad, pad)] * 2, use_bias=True,
                        bias_init=bias_init, dtype=self.dtype,
                        name=f"{head}_out")(z)
            out[head] = z.astype(jnp.float32)
        return out


def build(
    num_classes: int,
    num_keypoints: int = 0,
    head_conv: int = 256,
    down_ratio: int = 4,
    freeze_base: bool = False,
    rotated_boxes: bool = False,
    pretrained: Any = None,
    dtype: Any = jnp.float32,
) -> Backend:
    """Factory matching the reference signature (backends/dla.py:513-531).

    ``pretrained`` takes a filesystem path to a torch ``.pth`` (imagenet
    dla34 or coco_dla_2x); the reference's implicit model-zoo download is
    replaced by the explicit path + import shim.
    """
    heads = make_heads_dict(num_classes, num_keypoints, rotated_boxes)
    module = DLASeg(heads=heads, down_ratio=down_ratio, final_kernel=1,
                    last_level=5, head_conv=head_conv, dtype=dtype)
    return Backend(
        module=module,
        down_ratio=down_ratio,
        rotated_boxes=rotated_boxes,
        num_classes=num_classes,
        num_keypoints=num_keypoints,
        heads=heads,
        name="dla34",
        extra={"freeze_base": freeze_base, "pretrained": pretrained},
    )
