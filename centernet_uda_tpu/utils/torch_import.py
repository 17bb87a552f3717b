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


def import_state_dict(path, params, backend_name: str):
    base = backend_name.split("-")[0]
    for key in (backend_name, base):
        if key in _SHIMS:
            sd = load_state_dict(path)
            return _SHIMS[key](sd, params)
    # generic fallback: nothing imported, keep fresh params
    log.warning(
        "no torch-import shim registered for backend '%s'; weights at %s "
        "were NOT imported", backend_name, path,
    )
    return params
