"""Torch ``.pth`` -> Flax parameter import shims.

The reference loads pretrained torch state dicts (``coco_dla_2x.pth``,
configs/defaults.yaml:5; torchvision resnets via hub,
backends/resnet.py:27-28). torch (CPU) is available in the TPU image, so we
can read the files directly; each backend registers a key-mapping shim that
transposes conv kernels OIHW -> HWIO and renames module paths onto our Flax
tree. Missing/mismatched entries follow the reference's tolerant semantics
(utils/helper.py:103-117): warn and keep the fresh value.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)

# backend name -> fn(torch_state_dict, flax_params) -> flax_params
_SHIMS: Dict[str, Callable] = {}


def register_shim(name: str):
    def deco(fn):
        _SHIMS[name] = fn
        return fn

    return deco


def load_state_dict(path) -> Dict[str, np.ndarray]:
    import torch

    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint.get("state_dict", checkpoint)
    out = {}
    for k, v in state_dict.items():
        # strip DataParallel prefix (utils/helper.py:96-100)
        if k.startswith("module") and not k.startswith("module_list"):
            k = k[7:]
        out[k] = v.detach().cpu().numpy()
    return out


def conv_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def conv_transpose_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d IOHW -> flax ConvTranspose HWIO.

    flax's ConvTranspose lowers to ``lax.conv_transpose`` which uses a
    *non-flipped* kernel in HWIO with (in, out) channel order; torch stores
    (in, out, kH, kW) and flips spatially, so the import mirrors H and W.
    """
    return jnp.asarray(np.transpose(w[..., ::-1, ::-1], (2, 3, 0, 1)))


def import_state_dict(path, variables, backend_name: str):
    """Import a torch state dict into flax ``variables``
    ({'params': ..., 'batch_stats': ...}). Returns updated variables."""
    base = "".join(c for c in backend_name if not c.isdigit())
    for key in (backend_name, base):
        if key in _SHIMS:
            sd = load_state_dict(path)
            return _SHIMS[key](sd, variables)
    log.warning(
        "no torch-import shim registered for backend '%s'; weights at %s "
        "were NOT imported", backend_name, path,
    )
    return variables


# ---------------------------------------------------------------------------
# generic flat-tree machinery
# ---------------------------------------------------------------------------


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat):
    out = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def _apply_mapping(sd, variables, path_to_torch, backend_label):
    """Fill flax variables from ``sd`` using ``path_to_torch(collection,
    parts) -> (torch_key, transform)`` (None = leave fresh)."""
    new = {}
    missing, mismatched, used = [], [], set()
    for collection in ("params", "batch_stats"):
        flat = _flatten(variables.get(collection, {}))
        new_flat = {}
        for path, value in flat.items():
            spec = path_to_torch(collection, path)
            if spec is None:
                new_flat[path] = value
                continue
            tkey, transform = spec
            if tkey not in sd:
                missing.append((collection,) + path)
                new_flat[path] = value
                continue
            imported = transform(sd[tkey])
            if tuple(imported.shape) != tuple(value.shape):
                mismatched.append(
                    ((collection,) + path, imported.shape, value.shape)
                )
                new_flat[path] = value
            else:
                new_flat[path] = jnp.asarray(imported, value.dtype)
                used.add(tkey)
        new[collection] = _unflatten(new_flat)

    for item in missing:
        log.warning("no parameter %s available in torch checkpoint",
                    "/".join(item))
    for item, got, want in mismatched:
        log.warning("skip parameter %s because of shape mismatch (%s vs %s)",
                    "/".join(item), got, want)
    unused = [k for k in sd if k not in used and "num_batches_tracked" not in k
              and not k.startswith("fc.")]
    if unused:
        log.info("%s import: %d torch tensors unused (e.g. %s)",
                 backend_label, len(unused), unused[:4])
    log.info("%s import: %d/%d flax leaves restored", backend_label,
             sum(len(_flatten(new[c])) for c in new)
             - len(missing) - len(mismatched),
             sum(len(_flatten(new[c])) for c in new))
    return new


_ID = lambda w: w  # noqa: E731


def _bn_leaf(torch_prefix, leaf):
    suffix = {"scale": "weight", "bias": "bias",
              "mean": "running_mean", "var": "running_var"}[leaf]
    return f"{torch_prefix}.{suffix}", _ID


# ---------------------------------------------------------------------------
# DLA-34 (backends/dla.py naming; works for imagenet dla34 + coco_dla_2x)
# ---------------------------------------------------------------------------


def _dla_path_to_torch(collection, path):
    parts = list(path)
    leaf = parts[-1]

    def bn(prefix):
        return _bn_leaf(prefix, leaf)

    top = parts[0]

    # trunk --------------------------------------------------------------
    if top == "base":
        sub = parts[1]
        if sub == "base_conv":
            return "base.base_layer.0.weight", conv_kernel
        if sub == "base_bn":
            return bn("base.base_layer.1")
        if sub.startswith("level0") or sub.startswith("level1"):
            level, kind = sub.split("_")  # e.g. level0, conv0
            idx = int(kind[-1])
            if kind.startswith("conv"):
                return f"base.{level}.{3 * idx}.weight", conv_kernel
            return bn(f"base.{level}.{3 * idx + 1}")
        # tree levels: base/levelN/[tree1[/tree1...]]/{convK,bnK} plus
        # root/{conv,bn} and project_{conv,bn}
        tpath = "base." + ".".join(parts[1:-1])
        mod = parts[-2]
        if mod == "project_conv":
            return ("base." + ".".join(parts[1:-2]) + ".project.0.weight",
                    conv_kernel)
        if mod == "project_bn":
            return bn("base." + ".".join(parts[1:-2]) + ".project.1")
        if mod.startswith("conv"):  # conv1/conv2 in blocks, root's "conv"
            return f"{tpath}.weight", conv_kernel
        if mod.startswith("bn"):  # bn1/bn2 in blocks, root's "bn"
            return bn(tpath)
        return None

    # upsampling necks: dla_up/ida_i/{proj,node}_j/{conv (DCN), actf_bn}
    # and dla_up/ida_i/up_j/kernel; ida_up/* identical one level shallower
    if top in ("dla_up", "ida_up"):
        mod = parts[-2]
        if mod.startswith("up_") and leaf == "kernel":
            return ".".join(parts[:-1]) + ".weight", conv_transpose_kernel_grouped
        if mod == "conv" and leaf == "weight":
            return ".".join(parts[:-1]) + ".weight", conv_kernel
        if mod == "conv" and leaf == "bias":
            return ".".join(parts[:-1]) + ".bias", _ID
        if mod == "conv_offset_mask":
            tkey = ".".join(parts[:-1])  # DCN submodule is named "conv"
            if leaf == "kernel":
                return tkey + ".weight", conv_kernel
            return tkey + ".bias", _ID
        if mod == "actf_bn":
            return bn(".".join(parts[:-2]) + ".actf.0")
        return None

    # heads ---------------------------------------------------------------
    if top.endswith("_conv") or top.endswith("_out"):
        head, kind = top.rsplit("_", 1)
        idx = 0 if kind == "conv" else 2
        tkey = f"{head}.{idx}.{'weight' if leaf == 'kernel' else 'bias'}"
        return tkey, conv_kernel if leaf == "kernel" else _ID

    return None


def conv_transpose_kernel_grouped(w: np.ndarray) -> jnp.ndarray:
    """torch grouped ConvTranspose2d (in=o, out/groups=1, k, k) -> our
    DepthwiseUp kernel (k, k, 1, o) stored in torch orientation (the module
    flips internally)."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


@register_shim("dla")
def _import_dla(sd, variables):
    return _apply_mapping(sd, variables, _dla_path_to_torch, "dla34")


# ---------------------------------------------------------------------------
# ResNet (torchvision naming wrapped in Sequential: backends/resnet.py:27-30)
# ---------------------------------------------------------------------------


def _resnet_path_to_torch(collection, path):
    parts = list(path)
    leaf = parts[-1]

    def bn(prefix):
        return _bn_leaf(prefix, leaf)

    top = parts[0]
    if top == "base":
        sub = parts[1]
        if sub == "conv1":
            return "base.0.weight", conv_kernel
        if sub == "bn1":
            return bn("base.1")
        if sub.startswith("layer"):
            stage, blk = sub.split("_")  # layer1, 0
            seq_idx = int(stage[len("layer"):]) + 3  # layer1 -> base.4
            mod = parts[2]
            tprefix = f"base.{seq_idx}.{blk}"
            if mod.startswith("conv"):
                return f"{tprefix}.{mod}.weight", conv_kernel
            if mod.startswith("bn"):
                return bn(f"{tprefix}.{mod}")
            if mod == "downsample_conv":
                return f"{tprefix}.downsample.0.weight", conv_kernel
            if mod == "downsample_bn":
                return bn(f"{tprefix}.downsample.1")
        return None

    if top == "neck":
        sub = parts[1]
        idx = int(sub[-1])
        if sub.startswith("deconv"):
            return f"deconv_layers.{3 * idx}.weight", conv_transpose_kernel
        if sub.startswith("bn"):
            return bn(f"deconv_layers.{3 * idx + 1}")
        return None

    if top == "heads":
        sub = parts[1]  # e.g. hm_conv / hm_out
        head, kind = sub.rsplit("_", 1)
        idx = 0 if kind == "conv" else 2
        tkey = f"{head}.{idx}.{'weight' if leaf == 'kernel' else 'bias'}"
        return tkey, conv_kernel if leaf == "kernel" else _ID

    return None


@register_shim("resnet")
def _import_resnet(sd, variables):
    return _apply_mapping(sd, variables, _resnet_path_to_torch, "resnet")


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision naming under .base: backends/mobilenetv2.py:31-36;
# flat deconv Sequential: backends/mobilenetv2.py:133-166)
# ---------------------------------------------------------------------------

# torchvision InvertedResidual key layout inside features.N.conv:
# expand==1 (features.1): depthwise at conv.0.0 (+bn conv.0.1),
#   project at conv.1 (+bn conv.2);
# expand!=1: expand at conv.0.0 (+bn conv.0.1), depthwise at conv.1.0
#   (+bn conv.1.1), project at conv.2 (+bn conv.3).
_MNV2_CONV_IDX = {
    True: ({0: "conv.0.0", 1: "conv.1"}, {0: "conv.0.1", 1: "conv.2"}),
    False: ({0: "conv.0.0", 1: "conv.1.0", 2: "conv.2"},
            {0: "conv.0.1", 1: "conv.1.1", 2: "conv.3"}),
}


def _mobilenetv2_path_to_torch(collection, path, use_dcn=False,
                               trunk_prefix="base"):
    parts = list(path)
    leaf = parts[-1]

    def bn(prefix):
        return _bn_leaf(prefix, leaf)

    top = parts[0]
    if top == "base":
        sub = parts[1]
        if sub == "stem_conv":
            return f"{trunk_prefix}.0.0.weight", conv_kernel
        if sub == "stem_bn":
            return bn(f"{trunk_prefix}.0.1")
        if sub == "head_conv":
            return f"{trunk_prefix}.18.0.weight", conv_kernel
        if sub == "head_bn":
            return bn(f"{trunk_prefix}.18.1")
        if sub.startswith("layer"):
            lid = int(sub[len("layer"):])
            mod = parts[2]
            conv_map, bn_map = _MNV2_CONV_IDX[lid == 1]
            idx = int(mod[-1])
            if mod.startswith("conv"):
                return (f"{trunk_prefix}.{lid}.{conv_map[idx]}.weight",
                        conv_kernel)
            return bn(f"{trunk_prefix}.{lid}.{bn_map[idx]}")
        return None

    # neck: reference flat Sequential ids — per stage [ConvTranspose, BN,
    # ReLU] (3 entries) without DCN, [DCN, BN, ReLU, ConvTranspose, BN,
    # ReLU] (6 entries) with DCN (backends/mobilenetv2.py:144-166)
    per_stage = 6 if use_dcn else 3
    if top.startswith("neck_dcn_bn"):
        stage = int(top[len("neck_dcn_bn"):])
        return bn(f"deconv_layers.{per_stage * stage + 1}")
    if top.startswith("neck_dcn"):
        stage = int(top[len("neck_dcn"):])
        base_key = f"deconv_layers.{per_stage * stage}"
        mod = parts[-2] if len(parts) > 2 else top
        if mod == "conv_offset_mask":
            if leaf == "kernel":
                return f"{base_key}.conv_offset_mask.weight", conv_kernel
            return f"{base_key}.conv_offset_mask.bias", _ID
        if leaf == "weight":
            return f"{base_key}.weight", conv_kernel
        return f"{base_key}.bias", _ID
    if top.startswith("neck_deconv"):
        stage = int(top[len("neck_deconv"):])
        offset = 3 if use_dcn else 0
        return (f"deconv_layers.{per_stage * stage + offset}.weight",
                conv_transpose_kernel)
    if top.startswith("neck_bn"):
        stage = int(top[len("neck_bn"):])
        offset = 4 if use_dcn else 1
        return bn(f"deconv_layers.{per_stage * stage + offset}")

    # skips: plain Conv2d named by the reference's literal flat ids {0, 3}
    # (backends/mobilenetv2.py:10-16,66-74): our stage s -> flat id 3*s
    if top.startswith("skip_"):
        stage = int(top[len("skip_"):])
        tkey = f"skip_{3 * stage}"
        if leaf == "kernel":
            return f"{tkey}.weight", conv_kernel
        return f"{tkey}.bias", _ID

    if top == "heads":
        sub = parts[1]
        head, kind = sub.rsplit("_", 1)
        idx = 0 if kind == "conv" else 2
        tkey = f"{head}.{idx}.{'weight' if leaf == 'kernel' else 'bias'}"
        return tkey, conv_kernel if leaf == "kernel" else _ID

    return None


@register_shim("mobilenetv")  # import_state_dict strips digits
@register_shim("mobilenetv2")
def _import_mobilenetv2(sd, variables):
    flat = _flatten(variables.get("params", {}))
    use_dcn = any(p[0].startswith("neck_dcn") for p in flat)

    def mapper(collection, path):
        return _mobilenetv2_path_to_torch(collection, path, use_dcn=use_dcn)

    return _apply_mapping(sd, variables, mapper, "mobilenetv2")


# ---------------------------------------------------------------------------
# EfficientNet (lukemelas naming under .base: backends/efficientnet.py:53-56;
# flat deconv Sequential + Sequential skips: backends/efficientnet.py:84-91,
# 176-196)
# ---------------------------------------------------------------------------

_EFFNET_BLOCK_KEYS = {
    "expand_conv": ("_expand_conv.weight", "conv"),
    "depthwise_conv": ("_depthwise_conv.weight", "conv"),
    "project_conv": ("_project_conv.weight", "conv"),
    "se_reduce": ("_se_reduce", "convb"),
    "se_expand": ("_se_expand", "convb"),
    "bn0": ("_bn0", "bn"),
    "bn1": ("_bn1", "bn"),
    "bn2": ("_bn2", "bn"),
}

# our deconv stage s -> the reference's literal skip flat ids {2, 5}
# (backends/efficientnet.py:8-29)
_EFFNET_SKIP_FLAT = {0: 2, 1: 5}


def _efficientnet_path_to_torch(collection, path, use_upsample=False,
                                trunk_prefix="base."):
    parts = list(path)
    leaf = parts[-1]

    def bn(prefix):
        return _bn_leaf(prefix, leaf)

    top = parts[0]
    if top == "base":
        sub = parts[1]
        if sub == "stem_conv":
            return f"{trunk_prefix}_conv_stem.weight", conv_kernel
        if sub == "stem_bn":
            return bn(f"{trunk_prefix}_bn0")
        if sub == "head_conv":
            return f"{trunk_prefix}_conv_head.weight", conv_kernel
        if sub == "head_bn":
            return bn(f"{trunk_prefix}_bn1")
        if sub.startswith("block"):
            idx = int(sub[len("block"):])
            mod = parts[2]
            spec = _EFFNET_BLOCK_KEYS.get(mod)
            if spec is None:
                return None
            tsuffix, kind = spec
            tkey = f"{trunk_prefix}_blocks.{idx}.{tsuffix}"
            if kind == "conv":
                return tkey, conv_kernel
            if kind == "convb":
                if leaf == "kernel":
                    return f"{tkey}.weight", conv_kernel
                return f"{tkey}.bias", _ID
            return bn(tkey)
        return None

    # neck: per stage [ConvTranspose, BN, ReLU] (3 entries) or with
    # use_upsample [Upsample, Conv2d, BN, ReLU] (4 entries)
    if top.startswith("neck_deconv"):
        stage = int(top[len("neck_deconv"):])
        return f"deconv_layers.{3 * stage}.weight", conv_transpose_kernel
    if top.startswith("neck_conv"):
        stage = int(top[len("neck_conv"):])
        return f"deconv_layers.{4 * stage + 1}.weight", conv_kernel
    if top.startswith("neck_bn"):
        stage = int(top[len("neck_bn"):])
        tkey = (f"deconv_layers.{4 * stage + 2}" if use_upsample
                else f"deconv_layers.{3 * stage + 1}")
        return bn(tkey)

    # skips: Sequential(Conv, BN, ReLU) named by literal flat id
    if top.startswith("skip_"):
        rest = top[len("skip_"):]  # e.g. "0_conv" / "1_bn"
        stage_s, kind = rest.split("_", 1)
        tbase = f"skip_{_EFFNET_SKIP_FLAT[int(stage_s)]}"
        if kind == "conv":
            if leaf == "kernel":
                return f"{tbase}.0.weight", conv_kernel
            return f"{tbase}.0.bias", _ID
        return bn(f"{tbase}.1")

    if top == "heads":
        sub = parts[1]
        head, kind = sub.rsplit("_", 1)
        idx = 0 if kind == "conv" else 2
        tkey = f"{head}.{idx}.{'weight' if leaf == 'kernel' else 'bias'}"
        return tkey, conv_kernel if leaf == "kernel" else _ID

    return None


@register_shim("efficientnet-b")  # import_state_dict strips digits
@register_shim("efficientnet")
def _import_efficientnet(sd, variables):
    flat = _flatten(variables.get("params", {}))
    use_upsample = any(p[0].startswith("neck_conv") for p in flat)

    def mapper(collection, path):
        return _efficientnet_path_to_torch(collection, path,
                                           use_upsample=use_upsample)

    return _apply_mapping(sd, variables, mapper, "efficientnet")


# ---------------------------------------------------------------------------
# Backbone (trunk-only, ImageNet) pretrained import.
#
# The reference downloads trunk weights at build time:
# backends/resnet.py:27-30 (torchvision hub), backends/dla.py:23-25,297-309
# (dl.yf.io model zoo), backends/mobilenetv2.py:31-36 (torchvision hub),
# backends/efficientnet.py:53-56 (lukemelas hub). Those checkpoints use the
# *bare* trunk naming (no "base." wrapper), so each backend gets a trunk
# mapper; every non-trunk flax leaf keeps its fresh initialization.
# ---------------------------------------------------------------------------


def _resnet_trunk_path_to_torch(collection, path):
    """torchvision resnet naming: conv1/bn1/layer{1..4}.{b}.{mod}."""
    parts = list(path)
    leaf = parts[-1]
    if parts[0] != "base":
        return None

    def bn(prefix):
        return _bn_leaf(prefix, leaf)

    sub = parts[1]
    if sub == "conv1":
        return "conv1.weight", conv_kernel
    if sub == "bn1":
        return bn("bn1")
    if sub.startswith("layer"):
        stage, blk = sub.split("_")
        mod = parts[2]
        tprefix = f"{stage}.{blk}"
        if mod.startswith("conv"):
            return f"{tprefix}.{mod}.weight", conv_kernel
        if mod.startswith("bn"):
            return bn(f"{tprefix}.{mod}")
        if mod == "downsample_conv":
            return f"{tprefix}.downsample.0.weight", conv_kernel
        if mod == "downsample_bn":
            return bn(f"{tprefix}.downsample.1")
    return None


def _dla_trunk_path_to_torch(collection, path):
    """ImageNet dla34 naming = the full-model trunk keys minus 'base.'
    (the reference loads them into the bare DLA module,
    backends/dla.py:297-309)."""
    if path[0] != "base":
        return None
    spec = _dla_path_to_torch(collection, path)
    if spec is None:
        return None
    tkey, transform = spec
    return tkey[len("base."):], transform


def _mobilenetv2_trunk_path_to_torch(collection, path):
    if path[0] != "base":
        return None
    return _mobilenetv2_path_to_torch(collection, path,
                                      trunk_prefix="features")


def _efficientnet_trunk_path_to_torch(collection, path):
    if path[0] != "base":
        return None
    return _efficientnet_path_to_torch(collection, path, trunk_prefix="")


_TRUNK_MAPPERS = {
    "resnet": _resnet_trunk_path_to_torch,
    "dla": _dla_trunk_path_to_torch,
    "mobilenetv2": _mobilenetv2_trunk_path_to_torch,
    "efficientnet": _efficientnet_trunk_path_to_torch,
}

# torch-hub cache filename prefixes per backend family, used to resolve
# ``pretrained: true`` without network egress
_HUB_FILE_PREFIXES = {
    "resnet18": ("resnet18-",),
    "resnet34": ("resnet34-",),
    "resnet50": ("resnet50-",),
    "resnet101": ("resnet101-",),
    "resnet152": ("resnet152-",),
    "dla34": ("dla34-",),
    "mobilenetv2": ("mobilenet_v2-",),
}


def _trunk_family(backend_name: str) -> str:
    for family in _TRUNK_MAPPERS:
        if backend_name.startswith(family):
            return family
    raise KeyError(
        f"no backbone-pretrained trunk mapper for backend '{backend_name}'"
    )


def _hub_cache_candidates():
    import os

    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache", "torch")
    )
    return [
        os.path.join(torch_home, "hub", "checkpoints"),
        os.path.join(torch_home, "checkpoints"),
    ]


def resolve_pretrained_path(backend_name: str, pretrained):
    """Resolve the backend-level ``pretrained`` param to a weight file.

    ``pretrained`` may be a path (used directly) or ``True`` (search the
    torch hub cache — this image has no network egress, so the download the
    reference performs at backends/resnet.py:27-30 etc. must already be
    cached). Raises with a clear message when nothing is found: a silent
    no-op here would invalidate any mAP-parity comparison.
    """
    import glob
    import os

    if isinstance(pretrained, (str, bytes)):
        path = os.path.expanduser(os.fspath(pretrained))
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"backend pretrained weights not found: {path}"
            )
        return path

    prefixes = _HUB_FILE_PREFIXES.get(
        backend_name,
        (backend_name + "-",) if backend_name.startswith("efficientnet")
        else (),
    )
    searched = []
    for cache_dir in _hub_cache_candidates():
        for prefix in prefixes:
            pattern = os.path.join(cache_dir, prefix + "*.pth")
            searched.append(pattern)
            hits = sorted(glob.glob(pattern))
            if hits:
                return hits[0]
    raise FileNotFoundError(
        f"pretrained=True for backend '{backend_name}' but no cached "
        f"weights found (searched {searched}); this environment has no "
        "network egress — download the checkpoint elsewhere and either "
        "place it in the torch hub cache or set "
        "model.backend.params.pretrained to its path"
    )


def import_trunk(path, variables, backend_name: str):
    """Import trunk-only (ImageNet) torch weights into flax ``variables``."""
    family = _trunk_family(backend_name)
    sd = load_state_dict(path)
    return _apply_mapping(sd, variables, _TRUNK_MAPPERS[family],
                          f"{backend_name} trunk")


def load_backbone_pretrained(backend, variables):
    """Consume ``Backend.extra['pretrained']`` (the backend-level
    ``pretrained`` param every reference backend honors at build time).

    Returns ``variables`` updated with the imported trunk weights; no-op
    when the param is falsy."""
    pretrained = (backend.extra or {}).get("pretrained")
    if not pretrained:
        return variables
    path = resolve_pretrained_path(backend.name, pretrained)
    log.info("loading backbone pretrained weights for %s from %s",
             backend.name, path)
    return import_trunk(path, variables, backend.name)
