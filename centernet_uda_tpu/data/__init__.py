"""Host-side data pipeline: COCO parsing, augmentation, target encoding.

Registry mirrors the reference's reflection wiring — train.py:26-27 resolves
``datasets.<name>.Dataset`` — so experiment YAML ``datasets.*.name`` values
(``coco``, ``coco_merger``) work unchanged.
"""

from typing import Callable, Dict


def _coco(**params):
    from centernet_uda_tpu.data.coco import Dataset

    return Dataset(**params)


def _coco_merger(**params):
    from centernet_uda_tpu.data.coco_merger import Dataset

    return Dataset(**params)


_REGISTRY: Dict[str, Callable] = {
    "coco": _coco,
    "coco_merger": _coco_merger,
}


def build(name: str, **params):
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**params)


__all__ = ["build"]
