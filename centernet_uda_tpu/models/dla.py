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

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from centernet_uda_tpu.models.common import (
    Backend,
    ConvParams,
    apply_merged_heads,
    batch_norm,
    make_heads_dict,
)
from centernet_uda_tpu.ops.dcn import DCN

DLA34_LEVELS = (1, 1, 1, 2, 2, 1)
DLA34_CHANNELS = (16, 32, 64, 128, 256, 512)


# ---------------------------------------------------------------------------
# Space-to-depth stem
#
# The reference stem runs 7x7/3x3 convs + BN at full input resolution with
# 16 channels (backends/dla.py:236-247,277-287). On TPU, C=16 uses 16 of the
# 128 vector lanes, so every BN/elementwise pass there runs at ~12% lane
# efficiency — profiled at ~27 ms of a 329 ms DLA-34 train step. Packing
# 2x2 spatial phases into channels (space-to-depth) runs the same math at
# half resolution with 4x the channels: identical outputs, params unchanged
# (the packed kernel is a constant-index gather of the original HWIO
# weights), BN statistics pooled over phases via a 5D reshape.
# ---------------------------------------------------------------------------


def _s2d(x: jax.Array, pack: int = 2) -> jax.Array:
    """(B, H, W, C) -> (B, H/p, W/p, p*p*C), phase-major channel layout."""
    p = pack
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)


def _d2s(x: jax.Array) -> jax.Array:
    """Inverse of ``_s2d`` (pack 2)."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, c)


def _repack4_to2(x: jax.Array) -> jax.Array:
    """Phase-layout change: 4x4-packed (B, H, W, 16C) -> 2x2-packed
    (B, 2H, 2W, 4C). Original pixel y = 4Y + ai splits as
    y = 2*(2Y + ahi) + alo with ai = 2*ahi + alo — the high phase bits
    move onto the (doubled) grid, the low bits stay packed."""
    b, h, w, c16 = x.shape
    c = c16 // 16
    x = x.reshape(b, h, w, 2, 2, 2, 2, c)  # (ahi, alo, ajhi, ajlo, c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)
    return x.reshape(b, 2 * h, 2 * w, 4 * c)


@functools.lru_cache(maxsize=None)
def _s2d_weight_map(k: int, cin: int, cout: int, stride: int, pack: int = 2):
    """Constant gather map turning an HWIO (k,k,cin,cout) kernel into its
    space-to-depth equivalent for a ``pack`` x ``pack`` phase packing.

    Returns (idx, valid, pad) where idx indexes the flattened original
    kernel, valid zeroes unmapped taps, and pad is the packed-conv padding.
    stride 1 -> packed output (phase-major pack^2*cout); stride 2 (pack 2
    only) -> unpacked output (the stride-2 grid IS the packed grid).
    """
    assert stride == 1 or (stride, pack) == (2, 2)
    p = k // 2
    P = pack
    out_phases = ([(bi, bj) for bi in range(P) for bj in range(P)]
                  if stride == 1 else [(0, 0)])
    # packed tap range (union over phases)
    offs = [math.floor((b + u - p) / P)
            for b in {ph[0] for ph in out_phases} for u in range(k)]
    d_lo, d_hi = min(offs), max(offs)
    kp = d_hi - d_lo + 1
    cout_p = len(out_phases) * cout

    idx = np.zeros((kp, kp, P * P * cin, cout_p), np.int32)
    valid = np.zeros((kp, kp, P * P * cin, cout_p), np.float32)
    for pi, (bi, bj) in enumerate(out_phases):
        for u in range(k):
            for v in range(k):
                si, sj = bi + u - p, bj + v - p
                di, dj = math.floor(si / P) - d_lo, math.floor(sj / P) - d_lo
                ai, aj = si % P, sj % P
                for c in range(cin):
                    ci = (ai * P + aj) * cin + c
                    lin = ((u * k + v) * cin + c) * cout
                    idx[di, dj, ci, pi * cout:(pi + 1) * cout] = (
                        lin + np.arange(cout))
                    valid[di, dj, ci, pi * cout:(pi + 1) * cout] = 1.0
    return idx, valid, (-d_lo, d_hi)


class _S2DConv(nn.Module):
    """Conv on the space-to-depth grid with the ORIGINAL parameter shape.

    Declares the same (k, k, cin, features) HWIO kernel as the plain
    ``nn.Conv`` it replaces (same name/init -> checkpoint and torch-import
    parity), then applies its packed equivalent. stride 1 keeps the packed
    layout; stride 2 emits the unpacked stride-2 output directly.
    """

    features: int
    kernel: int
    stride: int
    in_features: int
    dtype: Any = jnp.float32
    pack: int = 2

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
            jnp.float32,
        )
        idx, valid, pad = _s2d_weight_map(
            self.kernel, self.in_features, self.features, self.stride,
            self.pack)
        wp = (jnp.take(w.reshape(-1), jnp.asarray(idx))
              * jnp.asarray(valid)).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype), wp, (1, 1), [pad, pad],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


def _pool_max_nonoverlap(x: jax.Array, stride: int) -> jax.Array:
    """Non-overlapping max pool (window == stride, the Tree downsample —
    reference backends/dla.py:186) as a reshape + reduce-max: identical
    forward to ``nn.max_pool``, but its autodiff avoids XLA's
    select_and_scatter backward (profiled ~1 ms/step at the level2 size).
    Tie handling differs (reduce_max's subgradient splits evenly; torch
    routes to the first index) — measure-zero for continuous activations.
    """
    b, h, w, c = x.shape
    s = stride
    if h % s or w % s:
        return nn.max_pool(x, (s, s), strides=(s, s))
    return x.reshape(b, h // s, s, w // s, s, c).max(axis=(2, 4))


def _phased_bn(xp: jax.Array, train: bool, name: str, dtype) -> jax.Array:
    """BN over the packed layout with statistics pooled across the 4 spatial
    phases — bitwise the reference per-channel statistics."""
    b, h, w, c4 = xp.shape
    x5 = xp.reshape(b, h, w, 4, c4 // 4)
    return batch_norm(train, name, dtype)(x5).reshape(b, h, w, c4)


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
            bottom = _pool_max_nonoverlap(x, self.stride)
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
    stem_s2d: bool = True
    # phase packing for the Cin=3 base conv (2 or 4). 4 packs the MXU
    # contraction fatter (Cin 12 -> 48) but the 4x4 -> 2x2 rephase it needs
    # (_repack4_to2) costs 17 ms/step in XLA relayout copies on v5e —
    # measured 3x more than the conv saves (train-step profile, BASELINE.md
    # round 3) — so 2 is the default.
    base_pack: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        ch = self.channels
        outputs = []

        # level0/level1: plain conv levels (backends/dla.py:277-287)
        def conv_level(x, planes, convs, stride, prefix, start=0):
            for i in range(start, convs):
                x = nn.Conv(planes, (3, 3),
                            strides=((stride if i == 0 else 1),) * 2,
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype, name=f"{prefix}_conv{i}")(x)
                x = batch_norm(train, f"{prefix}_bn{i}", self.dtype)(x)
                x = nn.relu(x)
            return x

        use_s2d = (self.stem_s2d
                   and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
        if use_s2d:
            # exact space-to-depth stem (see module comment above): same
            # params, same outputs, 4x the lane utilization at C=16.
            # The base 7x7 conv has Cin=3: 2x2 packing still feeds the MXU
            # only 12 contraction channels, so it packs 4x4 (Cin=48,
            # Cout=256, a 3x3 packed kernel at H/4) and rephases to the
            # 2x2 layout the rest of the stem runs in.
            if (self.base_pack == 4
                    and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
                xp = _S2DConv(ch[0], 7, 1, x.shape[-1], dtype=self.dtype,
                              pack=4, name="base_conv")(_s2d(x, 4))
                xp = _repack4_to2(xp)
            else:
                xp = _S2DConv(ch[0], 7, 1, x.shape[-1], dtype=self.dtype,
                              name="base_conv")(_s2d(x))
            xp = _phased_bn(xp, train, "base_bn", self.dtype)
            xp = nn.relu(xp)
            for i in range(self.levels[0]):
                xp = _S2DConv(ch[0], 3, 1, ch[0], dtype=self.dtype,
                              name=f"level0_conv{i}")(xp)
                xp = _phased_bn(xp, train, f"level0_bn{i}", self.dtype)
                xp = nn.relu(xp)
            outputs.append(_d2s(xp))
            x = _S2DConv(ch[1], 3, 2, ch[0], dtype=self.dtype,
                         name="level1_conv0")(xp)
            x = batch_norm(train, "level1_bn0", self.dtype)(x)
            x = nn.relu(x)
            x = conv_level(x, ch[1], self.levels[1], 2, "level1", start=1)
            outputs.append(x)
        else:
            x = nn.Conv(ch[0], (7, 7), padding=[(3, 3)] * 2, use_bias=False,
                        dtype=self.dtype, name="base_conv")(x)
            x = batch_norm(train, "base_bn", self.dtype)(x)
            x = nn.relu(x)
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

        feats = DLATrunk(self.levels, self.channels, dtype=self.dtype,
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

        # all heads in two merged convs (profiling: 2-convs-per-head cost
        # ~7.7 ms/step in re-reads + tiny-channel backward; see
        # common.apply_merged_heads). Params stay per-head.
        names = sorted(self.heads)
        conv_params, out_params = [], []
        for head in names:
            conv_params.append(ConvParams(
                self.head_conv, (3, 3), feat.shape[-1],
                name=f"{head}_conv")())
            bias_init = (nn.initializers.constant(-2.19) if "hm" in head
                         else nn.initializers.zeros)
            out_params.append(ConvParams(
                self.heads[head], (self.final_kernel,) * 2, self.head_conv,
                bias_init=bias_init, name=f"{head}_out")())
        return apply_merged_heads(
            feat, conv_params, out_params, names,
            [self.heads[h] for h in names], self.dtype,
            final_kernel=self.final_kernel)


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
