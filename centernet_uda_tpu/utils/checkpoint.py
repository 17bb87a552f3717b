"""Checkpoint save/load with the reference's last/best semantics.

Twin of ``utils/helper.py:83-147``: checkpoints carry
``{epoch, state_dict[, optimizer]}``; ``pretrained`` restores weights only
(epoch reset), ``resume`` also restores optimizer state and the epoch
counter (train.py:137-140). Loading tolerates partial checkpoints:
shape-mismatched parameters are skipped with a warning and missing
parameters keep their fresh initialization (utils/helper.py:103-117).

Format: a pickled pytree of numpy arrays (portable, no torch dependency).
``load_torch_weights`` imports reference ``.pth`` state dicts (torch CPU is
available in the image) through per-backend key-mapping shims.
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _flatten(tree, prefix=""):
    """Flatten a nested dict pytree into {dotted_key: leaf}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = tree
    return out


def _merge_flat(target, flat, prefix=""):
    """Copy flat values into the nested structure where shapes match."""
    if isinstance(target, dict):
        return {
            k: _merge_flat(v, flat, f"{prefix}{k}/") for k, v in target.items()
        }
    key = prefix.rstrip("/")
    if key not in flat:
        log.warning("no parameter %s available", key)
        return target
    value = flat[key]
    if hasattr(target, "shape") and tuple(value.shape) != tuple(target.shape):
        log.warning("skip parameter %s because of shape mismatch", key)
        return target
    return jnp.asarray(value)


def save_checkpoint(path, state, epoch: int, with_optimizer: bool = False) -> None:
    data = {
        "epoch": int(epoch),
        "params": _to_numpy_tree(state.params),
        "batch_stats": _to_numpy_tree(state.batch_stats),
    }
    if state.disc_params is not None:
        data["disc_params"] = _to_numpy_tree(state.disc_params)
    if with_optimizer:
        data["opt_state"] = _to_numpy_tree(state.opt_state)
        if state.disc_opt_state is not None:
            data["disc_opt_state"] = _to_numpy_tree(state.disc_opt_state)
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(
    path, state, resume: bool = False, backend_name: str = ""
) -> Tuple[Optional[Any], int]:
    """Restore a checkpoint into ``state``. Returns (new_state, epoch).

    Missing file is a warning, not an error (utils/helper.py:85-88).
    ``.pth`` files route through the torch import shim.
    """
    path = Path(path)
    if not path.exists():
        log.warning("Model path %s does not exist!", path)
        return None, 0

    if path.suffix == ".pth":
        variables = load_torch_weights(
            path,
            {"params": state.params, "batch_stats": state.batch_stats},
            backend_name,
        )
        return (
            state.replace(
                params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
            ),
            0,
        )

    with open(path, "rb") as f:
        data = pickle.load(f)

    epoch = int(data.get("epoch", 0)) if resume else 0

    params = _merge_flat(state.params, _flatten(data.get("params", {})))
    new_state = state.replace(params=params)

    if data.get("batch_stats"):
        bs = _merge_flat(state.batch_stats, _flatten(data["batch_stats"]))
        new_state = new_state.replace(batch_stats=bs)

    if state.disc_params is not None and data.get("disc_params"):
        dp = _merge_flat(state.disc_params, _flatten(data["disc_params"]))
        new_state = new_state.replace(disc_params=dp)

    if resume and "opt_state" in data:
        try:
            flat_def = jax.tree.structure(state.opt_state)
            leaves = jax.tree.leaves(data["opt_state"])
            new_state = new_state.replace(
                opt_state=jax.tree.unflatten(
                    flat_def, [jnp.asarray(v) for v in leaves]
                )
            )
            log.info("restore optimizer state at epoch %d", epoch)
        except Exception as exc:  # structure drift: keep fresh optimizer
            log.warning("could not restore optimizer state: %s", exc)
        if state.disc_opt_state is not None and "disc_opt_state" in data:
            try:
                flat_def = jax.tree.structure(state.disc_opt_state)
                leaves = jax.tree.leaves(data["disc_opt_state"])
                new_state = new_state.replace(
                    disc_opt_state=jax.tree.unflatten(
                        flat_def, [jnp.asarray(v) for v in leaves]
                    )
                )
            except Exception as exc:
                log.warning("could not restore discriminator optimizer: %s", exc)

    log.info("restored weights from %s", path)
    return new_state, epoch


def load_torch_weights(path, variables, backend_name: str):
    """Import a reference ``.pth`` checkpoint into our Flax variables.

    Dispatches to per-backend key-mapping shims (torchvision/DLA state-dict
    naming -> our module tree, OIHW -> HWIO kernel transposition, BN
    running stats -> batch_stats). Backends register their shim in
    ``centernet_uda_tpu.utils.torch_import``.
    """
    from centernet_uda_tpu.utils import torch_import

    return torch_import.import_state_dict(path, variables, backend_name)
