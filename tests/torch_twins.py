"""torchvision-compatible torch trunks for cross-framework parity tests.

The reference backends fetch their trunks with ``torch.hub.load`` at build
time (backends/resnet.py:27-30, backends/mobilenetv2.py:31-36); this image
has no network egress and no torchvision, so these twins reproduce the
torchvision module *structure* — identical ``state_dict()`` key layout and
identical ``children()`` order (the reference wraps
``Sequential(*children()[:-2])``) — letting ``tests/test_reference_parity``
instantiate the REAL reference backend modules (their neck / heads /
forward code verbatim) and compare them numerically against the Flax
models after a ``torch_import`` round trip.

Structure transcribed from the public torchvision 0.6 sources (resnet.py,
mobilenet.py) that `pytorch/vision:v0.6.0` resolves to.
"""

from __future__ import annotations

import torch
from torch import nn


# ---------------------------------------------------------------------------
# ResNet (BasicBlock variants: 18/34)
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    """Attribute order matches torchvision so ``children()[:-2]`` slices
    away exactly (avgpool, fc) like backends/resnet.py:30."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes) for _ in range(1, blocks)]
        return nn.Sequential(*layers)


_RESNET_LAYERS = {
    18: (BasicBlock, [2, 2, 2, 2]),
    34: (BasicBlock, [3, 4, 6, 3]),
    50: (Bottleneck, [3, 4, 6, 3]),
    101: (Bottleneck, [3, 4, 23, 3]),
    152: (Bottleneck, [3, 8, 36, 3]),
}


def resnet(num_layers: int) -> ResNet:
    block, layers = _RESNET_LAYERS[num_layers]
    return ResNet(block, layers)


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision 0.6 ``mobilenet_v2().features``)
# ---------------------------------------------------------------------------


class ConvBNReLU(nn.Sequential):
    def __init__(self, in_planes, out_planes, kernel_size=3, stride=1,
                 groups=1):
        padding = (kernel_size - 1) // 2
        super().__init__(
            nn.Conv2d(in_planes, out_planes, kernel_size, stride, padding,
                      groups=groups, bias=False),
            nn.BatchNorm2d(out_planes),
            nn.ReLU6(inplace=True),
        )


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden_dim = int(round(inp * expand_ratio))
        self.use_res_connect = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(inp, hidden_dim, kernel_size=1))
        layers.extend([
            ConvBNReLU(hidden_dim, hidden_dim, stride=stride,
                       groups=hidden_dim),
            nn.Conv2d(hidden_dim, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        ])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        if self.use_res_connect:
            return x + self.conv(x)
        return self.conv(x)


class MobileNetV2(nn.Module):
    def __init__(self):
        super().__init__()
        setting = [
            # t, c, n, s
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        features = [ConvBNReLU(3, 32, stride=2)]
        input_channel = 32
        for t, c, n, s in setting:
            for i in range(n):
                stride = s if i == 0 else 1
                features.append(
                    InvertedResidual(input_channel, c, stride, t))
                input_channel = c
        features.append(ConvBNReLU(input_channel, 1280, kernel_size=1))
        self.features = nn.Sequential(*features)


def mobilenet_v2() -> MobileNetV2:
    return MobileNetV2()


def fake_hub_load(repo, model, pretrained=False, **kw):
    """Drop-in for ``torch.hub.load`` (torchvision + lukemelas repos)."""
    assert not pretrained, "twins carry no pretrained weights"
    if model == "mobilenet_v2":
        return mobilenet_v2()
    if model.startswith("resnet"):
        return resnet(int(model[len("resnet"):]))
    if model == "efficientnet_b0":
        return EfficientNetB0Twin()
    raise KeyError(model)


# ---------------------------------------------------------------------------
# EfficientNet-b0 twin (lukemelas EfficientNet-PyTorch structure)
#
# Reproduces the attribute/state-dict surface backends/efficientnet.py
# actually touches (:38-140): `_conv_stem/_bn0/_blocks[i]._*/_conv_head/
# _bn1/_swish/_global_params.drop_connect_rate/extract_features`, with
# TF-style static SAME padding on strided convs, BN eps 1e-3 / momentum
# 0.01, squeeze-excite over the block INPUT channel count, and
# block(x, drop_connect_rate=...) signature.
# ---------------------------------------------------------------------------


class _SamePadConv(nn.Conv2d):
    """Conv2d with TF-style static SAME padding (Conv2dStaticSamePadding)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + (kh - 1) * self.dilation[0]
                 + 1 - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + (kw - 1) * self.dilation[1]
                 + 1 - iw, 0)
        if ph or pw:
            x = torch.nn.functional.pad(
                x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return torch.nn.functional.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation,
            self.groups)


class _Swish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class MBConvBlockTwin(nn.Module):
    def __init__(self, kernel, cin, cout, expand, stride):
        super().__init__()
        hidden = cin * expand
        self.has_se = True
        self.id_skip = stride == 1 and cin == cout
        if expand != 1:
            self._expand_conv = _SamePadConv(cin, hidden, 1, bias=False)
            self._bn0 = nn.BatchNorm2d(hidden, momentum=0.01, eps=1e-3)
        self._depthwise_conv = _SamePadConv(
            hidden, hidden, kernel, stride=stride, groups=hidden, bias=False)
        self._bn1 = nn.BatchNorm2d(hidden, momentum=0.01, eps=1e-3)
        se_ch = max(1, int(cin * 0.25))
        self._se_reduce = _SamePadConv(hidden, se_ch, 1)
        self._se_expand = _SamePadConv(se_ch, hidden, 1)
        self._project_conv = _SamePadConv(hidden, cout, 1, bias=False)
        self._bn2 = nn.BatchNorm2d(cout, momentum=0.01, eps=1e-3)
        self._swish = _Swish()

    def forward(self, inputs, drop_connect_rate=None):
        x = inputs
        if hasattr(self, "_expand_conv"):
            x = self._swish(self._bn0(self._expand_conv(x)))
        x = self._swish(self._bn1(self._depthwise_conv(x)))
        se = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        se = self._se_expand(self._swish(self._se_reduce(se)))
        x = torch.sigmoid(se) * x
        x = self._bn2(self._project_conv(x))
        if self.id_skip:
            if drop_connect_rate and self.training:
                keep = 1 - drop_connect_rate
                mask = torch.bernoulli(
                    torch.full((x.shape[0], 1, 1, 1), keep)) / keep
                x = x * mask
            x = x + inputs
        return x


class _GlobalParams:
    drop_connect_rate = 0.2


_B0_BLOCK_ARGS = (
    (3, 1, 32, 16, 1, 1),
    (3, 2, 16, 24, 6, 2),
    (5, 2, 24, 40, 6, 2),
    (3, 3, 40, 80, 6, 2),
    (5, 3, 80, 112, 6, 1),
    (5, 4, 112, 192, 6, 2),
    (3, 1, 192, 320, 6, 1),
)


class EfficientNetB0Twin(nn.Module):
    def __init__(self):
        super().__init__()
        self._conv_stem = _SamePadConv(3, 32, 3, stride=2, bias=False)
        self._bn0 = nn.BatchNorm2d(32, momentum=0.01, eps=1e-3)
        blocks = []
        for kernel, repeats, cin, cout, expand, stride in _B0_BLOCK_ARGS:
            for i in range(repeats):
                blocks.append(MBConvBlockTwin(
                    kernel, cin if i == 0 else cout, cout, expand,
                    stride if i == 0 else 1))
        self._blocks = nn.ModuleList(blocks)
        self._conv_head = _SamePadConv(320, 1280, 1, bias=False)
        self._bn1 = nn.BatchNorm2d(1280, momentum=0.01, eps=1e-3)
        self._swish = _Swish()
        self._global_params = _GlobalParams()

    def extract_features(self, x):
        x = self._swish(self._bn0(self._conv_stem(x)))
        for idx, block in enumerate(self._blocks):
            rate = self._global_params.drop_connect_rate
            if rate:
                rate *= float(idx) / len(self._blocks)
            x = block(x, drop_connect_rate=rate)
        return self._swish(self._bn1(self._conv_head(x)))


def seed_all(seed: int = 0) -> None:
    torch.manual_seed(seed)


# ---------------------------------------------------------------------------
# Pure-torch DCNv2 twin
#
# The reference neck needs the compiled CUDA/C++ extension
# (libs/DCNv2/dcn_v2.py imports `_ext`); this twin reproduces the DCN
# module contract (:95-128 — parameter names/shapes, zero-init
# conv_offset_mask, o1/o2/mask chunk layout, uniform weight init) and the
# CUDA sampler's math (src/cuda/dcn_v2_im2col_cuda.cu:125-204 — bilinear
# sample with per-corner zero reads outside [0, H) x [0, W), sigmoid
# mask, offset channel 2t = dy_t / 2t+1 = dx_t) in vectorized torch, so
# the REAL backends/dla.py DLASeg forward runs end-to-end on CPU.
# ---------------------------------------------------------------------------


def _twin_dcn_v2_forward(x, offset, mask, weight, bias,
                         stride, padding, dilation):
    import math as _math

    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    b, c, h, w = x.shape
    out_ch, _, kh, kw = weight.shape
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1

    ys = torch.arange(ho, dtype=torch.float32) * sh - ph
    xs = torch.arange(wo, dtype=torch.float32) * sw - pw
    x_flat = x.reshape(b, c, h * w)

    out = torch.zeros((b, out_ch, ho, wo), dtype=x.dtype)
    for t in range(kh * kw):
        ti, tj = t // kw, t % kw
        py = ys.view(1, -1, 1) + ti * dh + offset[:, 2 * t]
        px = xs.view(1, 1, -1) + tj * dw + offset[:, 2 * t + 1]
        m = mask[:, t]
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        fy = py - y0
        fx = px - x0

        val = torch.zeros((b, c, ho, wo), dtype=x.dtype)
        for (yi, xi, wgt) in (
            (y0, x0, (1 - fy) * (1 - fx)),
            (y0, x0 + 1, (1 - fy) * fx),
            (y0 + 1, x0, fy * (1 - fx)),
            (y0 + 1, x0 + 1, fy * fx),
        ):
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1)).long()
            g = torch.gather(
                x_flat, 2,
                idx.reshape(b, 1, -1).expand(b, c, ho * wo),
            ).reshape(b, c, ho, wo)
            val = val + g * (wgt * valid).unsqueeze(1)
        val = val * m.unsqueeze(1)
        out = out + torch.einsum("bchw,oc->bohw", val, weight[:, :, ti, tj])
    return out + bias.view(1, -1, 1, 1)


class TwinDCN(nn.Module):
    """Drop-in for ``libs.DCNv2.dcn_v2.DCN`` (no compiled extension)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride,
                 padding, dilation=1, deformable_groups=1):
        super().__init__()
        import math as _math

        def _pair(v):
            return (v, v) if isinstance(v, int) else tuple(v)

        assert deformable_groups == 1
        self.kernel_size = _pair(kernel_size)
        self.stride = _pair(stride)
        self.padding = _pair(padding)
        self.dilation = _pair(dilation)
        kh, kw = self.kernel_size
        self.weight = nn.Parameter(
            torch.Tensor(out_channels, in_channels, kh, kw))
        self.bias = nn.Parameter(torch.Tensor(out_channels))
        stdv = 1.0 / _math.sqrt(in_channels * kh * kw)
        self.weight.data.uniform_(-stdv, stdv)
        self.bias.data.zero_()
        self.conv_offset_mask = nn.Conv2d(
            in_channels, 3 * kh * kw, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding, bias=True)
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, x):
        out = self.conv_offset_mask(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)
        mask = torch.sigmoid(mask)
        return _twin_dcn_v2_forward(
            x, offset, mask, self.weight, self.bias,
            self.stride, self.padding, self.dilation)
