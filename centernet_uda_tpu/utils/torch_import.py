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
