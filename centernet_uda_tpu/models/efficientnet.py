"""CenterNet EfficientNet backend (b0-b8) in Flax (NHWC).

From-scratch twin of ``backends/efficientnet.py`` built on the lukemelas
EfficientNet-PyTorch architecture it hub-loads (:53-56): MBConv blocks with
squeeze-excite and swish, width/depth compound scaling per variant, BN with
eps 1e-3 / torch-momentum 0.01, stochastic depth (drop-connect) scaled by
block index (:119-122). The CenterNet side mirrors the reference: 3-stage
deconv neck (or nearest-upsample+conv with ``use_upsample``, :176-185) and
skip connections from the per-variant block table ``SKIP_MAPPINGS`` (:8-29)
added to the *post-activation* deconv stage outputs (flat indices 2/5 are
the stage ReLU outputs), each skip a Conv1x1+BN+ReLU (:84-91).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from centernet_uda_tpu.models.common import Backend, CenterNetHeads, make_heads_dict

# deconv stage -> block index providing the skip feature
# (backends/efficientnet.py:8-29; flat indices {2, 5} = stage {0, 1} outputs)
SKIP_MAPPINGS = {
    "b0": {1: 4, 0: 10},
    "b1": {1: 7, 0: 15},
    "b2": {1: 7, 0: 15},
    "b3": {1: 7, 0: 17},
    "b7": {1: 17, 0: 37},
}

# (width_mult, depth_mult) per variant (lukemelas efficientnet_params)
_VARIANT_PARAMS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
    "b8": (2.2, 3.6),
}

# base block args: (kernel, repeats, in, out, expand, stride)
_BLOCK_ARGS = (
    (3, 1, 32, 16, 1, 1),
    (3, 2, 16, 24, 6, 2),
    (5, 2, 24, 40, 6, 2),
    (3, 3, 40, 80, 6, 2),
    (5, 3, 80, 112, 6, 1),
    (5, 4, 112, 192, 6, 2),
    (3, 1, 192, 320, 6, 1),
)

_SE_RATIO = 0.25
_DROP_CONNECT_RATE = 0.2
_BN_MOMENTUM = 0.99  # torch momentum 0.01
_BN_EPS = 1e-3


def round_filters(filters: int, width_mult: float, divisor: int = 8) -> int:
    filters *= width_mult
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


def _bn(train: bool, name: str, dtype) -> nn.BatchNorm:
    return nn.BatchNorm(use_running_average=not train, momentum=_BN_MOMENTUM,
                        epsilon=_BN_EPS, name=name, dtype=dtype)


class MBConv(nn.Module):
    kernel: int
    out_channels: int
    expand: int
    stride: int
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand
        use_res = self.stride == 1 and cin == self.out_channels
        inputs = x

        if self.expand != 1:
            x = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(x)
            x = _bn(train, "bn0", self.dtype)(x)
            x = nn.swish(x)

        pad = (self.kernel - 1) // 2
        x = nn.Conv(hidden, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding="SAME" if self.stride > 1 else [(pad, pad)] * 2,
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="depthwise_conv")(x)
        x = _bn(train, "bn1", self.dtype)(x)
        x = nn.swish(x)

        # squeeze & excite
        se_channels = max(1, int(cin * _SE_RATIO))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_channels, (1, 1), use_bias=True, dtype=self.dtype,
                     name="se_reduce")(se)
        se = nn.swish(se)
        se = nn.Conv(hidden, (1, 1), use_bias=True, dtype=self.dtype,
                     name="se_expand")(se)
        x = jax.nn.sigmoid(se) * x

        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_conv")(x)
        x = _bn(train, "bn2", self.dtype)(x)

        if use_res:
            if train and self.drop_rate > 0 and self.has_rng("dropout"):
                # stochastic depth (lukemelas drop_connect)
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x / keep * mask.astype(x.dtype)
            x = x + inputs
        return x


class EfficientNetTrunk(nn.Module):
    """Stem + expanded MBConv blocks + head conv; returns the head feature
    and the per-block features for skips."""

    variant: str = "b0"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jax.Array, Dict[int, jax.Array]]:
        width, depth = _VARIANT_PARAMS[self.variant]

        x = nn.Conv(round_filters(32, width), (3, 3), strides=(2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = _bn(train, "stem_bn", self.dtype)(x)
        x = nn.swish(x)

        # expand blocks exactly like lukemelas: first block of each group
        # carries the stride/channel change, repeats follow with stride 1
        specs = []
        for kernel, repeats, cin, cout, expand, stride in _BLOCK_ARGS:
            cout_r = round_filters(cout, width)
            for i in range(round_repeats(repeats, depth)):
                specs.append((kernel, cout_r, expand, stride if i == 0 else 1))

        total = len(specs)
        feats: Dict[int, jax.Array] = {}
        for idx, (kernel, cout_r, expand, stride) in enumerate(specs):
            drop = _DROP_CONNECT_RATE * idx / total
            x = MBConv(kernel, cout_r, expand, stride, drop,
                       self.dtype, name=f"block{idx}")(x, train=train)
            feats[idx] = x

        x = nn.Conv(round_filters(1280, width), (1, 1), use_bias=False,
                    dtype=self.dtype, name="head_conv")(x)
        x = _bn(train, "head_bn", self.dtype)(x)
        x = nn.swish(x)
        return x, feats


class CenterEfficientNet(nn.Module):
    variant: str
    heads: Dict[str, int]
    use_skip: bool = False
    use_upsample: bool = False
    num_head_channels: int = 256
    num_deconv_channels: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x, feats = EfficientNetTrunk(self.variant, self.dtype,
                                     name="base")(x, train=train)

        skip_map = SKIP_MAPPINGS.get(self.variant, {}) if self.use_skip else {}

        for stage, planes in enumerate(self.num_deconv_channels):
            if self.use_upsample:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 4, w * 4, c), "bilinear")
                x = nn.Conv(planes, (3, 3), strides=(2, 2),
                            padding=[(1, 1)] * 2, use_bias=False,
                            dtype=self.dtype, name=f"neck_conv{stage}")(x)
            else:
                x = nn.ConvTranspose(planes, (4, 4), strides=(2, 2),
                                     padding="SAME", use_bias=False,
                                     dtype=self.dtype,
                                     name=f"neck_deconv{stage}")(x)
            x = _bn(train, f"neck_bn{stage}", self.dtype)(x)
            x = nn.relu(x)
            # skips join the post-activation stage output
            # (backends/efficientnet.py:129-134, flat indices 2/5)
            if stage in skip_map:
                fe = feats[skip_map[stage]]
                sx = nn.Conv(planes, (1, 1), use_bias=True, dtype=self.dtype,
                             name=f"skip_{stage}_conv")(fe)
                sx = _bn(train, f"skip_{stage}_bn", self.dtype)(sx)
                sx = nn.relu(sx)
                x = sx + x

        return CenterNetHeads(self.heads, head_conv=self.num_head_channels,
                              dtype=self.dtype, name="heads")(x)


def build(num_classes, variant: str = "b0", num_keypoints: int = 0,
          pretrained: Any = False, freeze_base: bool = False,
          rotated_boxes: bool = False, use_skip: bool = False,
          use_upsample: bool = False, num_head_channels: int = 256,
          num_deconv_channels: Optional[Sequence[int]] = None,
          dtype: Any = jnp.float32, **kwargs) -> Backend:
    """Factory matching backends/efficientnet.py:203-223."""
    if variant not in [f"b{x}" for x in range(0, 9)]:
        raise NotImplementedError(
            f"EffcientNet variant {variant} is not implemented!"
        )
    heads = make_heads_dict(num_classes, num_keypoints, rotated_boxes)
    module = CenterEfficientNet(
        variant=variant,
        heads=heads,
        use_skip=use_skip,
        use_upsample=use_upsample,
        num_head_channels=num_head_channels,
        num_deconv_channels=tuple(num_deconv_channels or (256, 256, 256)),
        dtype=dtype,
    )
    return Backend(
        module=module,
        down_ratio=4,
        rotated_boxes=rotated_boxes,
        num_classes=num_classes,
        num_keypoints=num_keypoints,
        heads=heads,
        name=f"efficientnet-{variant}",
        extra={"freeze_base": freeze_base, "pretrained": pretrained},
    )
