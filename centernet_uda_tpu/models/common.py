"""Shared model building blocks: deconv neck, prediction heads, backend wrapper.

TPU-first counterparts of the reference neck/head patterns
(``backends/resnet.py:43-51,75-100``): NHWC layout, Flax modules,
BatchNorm with flax running-stats (torch momentum 0.1 == flax momentum 0.9).
Under pjit the batch statistics are computed over the *global* (all-chip)
batch — a deliberate improvement over ``nn.DataParallel``'s per-GPU BN
(utils/helper.py:75-80); see SURVEY §7 "BatchNorm semantics".
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch BatchNorm2d(momentum=0.1) == flax BatchNorm(momentum=0.9)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# process-wide BN statistics grouping (config key ``bn_sync``):
#   1  = global-batch statistics (GSPMD all-reduces the moments; default)
#   N  = per-contiguous-group statistics over N equal batch slices —
#        with N = replica count this reproduces nn.DataParallel's per-GPU
#        BN (utils/helper.py:75-80; SURVEY §7 hard part #4) because the
#        batch axis is sharded contiguously, so each group IS one replica's
#        slice and the moment reductions stay shard-local (no collectives).
_BN_GROUPS = 1


def set_bn_groups(value) -> None:
    """Select BN statistics scope at trace time (config key ``bn_sync``:
    "global" | "replica" | int group count)."""
    global _BN_GROUPS
    if isinstance(value, str):
        v = value.lower()
        if v == "global":
            value = 1
        elif v == "replica":
            value = jax.device_count()
        else:
            raise ValueError(
                f"bn_sync must be 'global', 'replica' or an int, got {value!r}"
            )
    _BN_GROUPS = max(int(value), 1)


def get_bn_groups() -> int:
    return _BN_GROUPS


class GroupedBatchNorm(nn.Module):
    """BatchNorm with statistics per contiguous batch group.

    Variable layout (params.scale/bias, batch_stats.mean/var) matches
    ``nn.BatchNorm`` exactly, so checkpoints and the torch-import shims
    interop. Running stats are updated with the pooled (global) moments —
    E[var_g] + Var[mean_g] — rather than the reference's device-0-only
    update (a DataParallel artifact: replica buffers are discarded each
    step); normalization, which is what shapes training dynamics, follows
    the per-replica semantics.
    """

    groups: int
    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            mean = ra_mean.value
            var = ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale
            return (x.astype(jnp.float32) * inv + (bias - mean * inv)
                    ).astype(self.dtype)

        b = x.shape[0]
        g = self.groups if b % self.groups == 0 else 1
        xg = x.astype(jnp.float32).reshape(g, -1, c)
        gmean = jnp.mean(xg, axis=1)                      # (G, C)
        gvar = jnp.mean(jnp.square(xg), axis=1) - jnp.square(gmean)

        pooled_mean = jnp.mean(gmean, axis=0)
        pooled_var = (jnp.mean(gvar, axis=0)
                      + jnp.mean(jnp.square(gmean - pooled_mean), axis=0))
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * pooled_mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * pooled_var)

        inv = jax.lax.rsqrt(gvar + self.epsilon)[:, None, :] * scale
        out = (xg - gmean[:, None, :]) * inv + bias
        return out.reshape(x.shape).astype(self.dtype)


def batch_norm(train: bool, name: Optional[str] = None, dtype=jnp.float32):
    if _BN_GROUPS > 1:
        return GroupedBatchNorm(
            groups=_BN_GROUPS,
            use_running_average=not train,
            name=name,
            dtype=dtype,
        )
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        name=name,
        dtype=dtype,
    )


class DeconvNeck(nn.Module):
    """Upsampling neck: N x [ConvTranspose(k=4, s=2) + BN + ReLU].

    Twin of ``CenterResNet._make_deconv_layer`` (backends/resnet.py:75-100):
    three 2x transposed convolutions to 256 channels, no bias, BN momentum
    0.1 (torch), ReLU. Takes the backbone's stride-32 feature map to
    stride 4.
    """

    num_filters: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, planes in enumerate(self.num_filters):
            x = nn.ConvTranspose(
                features=planes,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name=f"deconv{i}",
            )(x)
            x = batch_norm(train, name=f"bn{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class UpsampleConvNeck(nn.Module):
    """Alternative neck: N x [nearest-Upsample 2x + Conv3x3 + BN + ReLU].

    Twin of the EfficientNet backend's ``use_deconv=False`` path
    (backends/efficientnet.py:176-185). Resize+conv avoids transposed-conv
    checkerboarding and lowers to pure conv on the MXU.
    """

    num_filters: Sequence[int] = (256, 256, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, planes in enumerate(self.num_filters):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = nn.Conv(planes, (3, 3), padding="SAME", use_bias=False,
                        dtype=self.dtype, name=f"upconv{i}")(x)
            x = batch_norm(train, name=f"bn{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class ConvParams(nn.Module):
    """Declares ``nn.Conv``-compatible parameters without applying the conv.

    Same variable layout ({kernel, bias}, float32, lecun-normal/zeros init)
    as ``nn.Conv(name=...)``, so checkpoints and the torch-import shims are
    oblivious to whether the conv ran standalone or merged (see
    ``apply_merged_heads``)."""

    features: int
    kernel_size: Tuple[int, int]
    in_features: int
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, jax.Array]:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, self.in_features, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32)
        return kernel, bias


def apply_merged_heads(
    feat: jax.Array,
    conv_params: Sequence[Tuple[jax.Array, jax.Array]],
    out_params: Sequence[Tuple[jax.Array, jax.Array]],
    head_names: Sequence[str],
    head_channels: Sequence[int],
    dtype,
    final_kernel: int = 1,
) -> Dict[str, jax.Array]:
    """Run all prediction heads as TWO convolutions instead of 2-per-head.

    The per-head 3x3 convs all read the same feature map; profiling the
    DLA-34 train step showed them (plus their backward) at ~7.7 ms of a
    116 ms step because each pass re-reads ``feat`` and the tiny-channel
    1x1 backward runs at ~1% MFU. Mathematically identical regrouping:

    - the 3x3 convs concatenate along the output-channel axis
      (conv distributes over output concat),
    - the per-head 1x1 (or ``final_kernel``) convs become ONE conv with a
      block-diagonal kernel, so each head output still sees only its own
      256-block of the merged hidden layer.

    Parameters stay per-head (``ConvParams``), so this is a pure
    compute-graph transformation with byte-identical checkpoints.
    """
    hidden = [k.shape[-1] for k, _ in conv_params]
    wc = jnp.concatenate([k for k, _ in conv_params], axis=-1).astype(dtype)
    bc = jnp.concatenate([b for _, b in conv_params], axis=0).astype(dtype)
    z = jax.lax.conv_general_dilated(
        feat.astype(dtype), wc, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = nn.relu(z + bc)

    fk = final_kernel
    total_in = sum(hidden)
    total_out = sum(head_channels)
    wo = jnp.zeros((fk, fk, total_in, total_out), jnp.float32)
    i_off = o_off = 0
    for (k, _), hid, cout in zip(out_params, hidden, head_channels):
        wo = wo.at[:, :, i_off:i_off + hid, o_off:o_off + cout].set(k)
        i_off += hid
        o_off += cout
    bo = jnp.concatenate([b for _, b in out_params], axis=0).astype(dtype)
    pad = fk // 2
    y = jax.lax.conv_general_dilated(
        z, wo.astype(dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (y + bo).astype(jnp.float32)

    out = {}
    o_off = 0
    for head, cout in zip(head_names, head_channels):
        out[head] = y[..., o_off:o_off + cout]
        o_off += cout
    return out


class CenterNetHeads(nn.Module):
    """Per-task prediction heads.

    Twin of the reference head stack (backends/resnet.py:43-51): for each
    head a Conv3x3(-> head_conv) + ReLU + Conv1x1(-> out_channels). The
    heatmap head's final bias can be initialized to ``hm_bias`` (-2.19 for
    DLA, backends/dla.py:485,493) so initial peak probabilities start near
    the focal-loss-friendly 0.1.

    All heads execute as two merged convolutions (``apply_merged_heads``)
    with unchanged per-head parameters.
    """

    heads: Dict[str, int]
    head_conv: int = 64
    hm_bias: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        names = sorted(self.heads)
        conv_params, out_params = [], []
        for head in names:
            conv_params.append(ConvParams(
                self.head_conv, (3, 3), x.shape[-1],
                name=f"{head}_conv")())
            bias_init = nn.initializers.zeros
            if head == "hm" and self.hm_bias is not None:
                bias_init = nn.initializers.constant(self.hm_bias)
            out_params.append(ConvParams(
                self.heads[head], (1, 1), self.head_conv,
                bias_init=bias_init, name=f"{head}_out")())
        return apply_merged_heads(
            x, conv_params, out_params, names,
            [self.heads[h] for h in names], self.dtype)


def make_heads_dict(num_classes: int, num_keypoints: int, rotated_boxes: bool
                    ) -> Dict[str, int]:
    """The backend head contract (backends/resnet.py:106-116)."""
    heads = {"hm": num_classes, "wh": 3 if rotated_boxes else 2, "reg": 2}
    if num_keypoints > 0:
        heads["kps"] = num_keypoints * 2
    return heads


@dataclass
class Backend:
    """A built backend: Flax module + the metadata train.py reads.

    Mirrors the reference module contract — ``forward(x) -> head dict`` plus
    ``.down_ratio`` / ``.rotated_boxes`` attributes (backends/resnet.py:25-26,
    read at train.py:119 and uda/base.py:82-96).
    """

    module: nn.Module
    down_ratio: int
    rotated_boxes: bool
    num_classes: int
    num_keypoints: int
    heads: Dict[str, int]
    name: str = "backend"
    extra: Dict[str, Any] = field(default_factory=dict)

    def init(self, rng: jax.Array, input_size: Tuple[int, int] = (512, 512)
             ) -> Dict[str, Any]:
        """Initialize variables with a dummy NHWC batch.

        Jitted as ONE program: un-jitted Flax init dispatches every op in
        the dummy forward eagerly, which costs hundreds of tiny per-op
        compiles (minutes through a remote-compile TPU tunnel, and each
        Pallas kernel compiles standalone)."""
        x = jnp.zeros((1, input_size[1], input_size[0], 3), jnp.float32)
        return jax.jit(partial(self.module.init, train=False))(rng, x)

    def apply(self, variables, x, train: bool = False, mutable=False):
        return self.module.apply(variables, x, train=train, mutable=mutable)
