"""Backend registry.

Mirrors the reference's string-driven factory wiring — train.py:85-86
instantiates ``backends.<name>.build(**params)`` by reflection — with an
explicit registry so experiment YAMLs (``model.backend.name``) resolve to the
Flax implementations unchanged.
"""

from typing import Callable, Dict

from centernet_uda_tpu.models.common import (
    Backend,
    CenterNetHeads,
    DeconvNeck,
    UpsampleConvNeck,
    make_heads_dict,
)


def _resnet_build(**params) -> Backend:
    from centernet_uda_tpu.models import resnet

    return resnet.build(**params)


def _dla_build(**params) -> Backend:
    from centernet_uda_tpu.models import dla

    return dla.build(**params)


def _mobilenetv2_build(**params) -> Backend:
    from centernet_uda_tpu.models import mobilenetv2

    return mobilenetv2.build(**params)


def _efficientnet_build(**params) -> Backend:
    from centernet_uda_tpu.models import efficientnet

    return efficientnet.build(**params)


_REGISTRY: Dict[str, Callable[..., Backend]] = {
    "resnet": _resnet_build,
    "dla": _dla_build,
    "mobilenetv2": _mobilenetv2_build,
    "efficientnet": _efficientnet_build,
}


def build(name: str, **params) -> Backend:
    """Build a backend by config name (``model.backend.name``)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown backend '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**params)


__all__ = [
    "build",
    "Backend",
    "CenterNetHeads",
    "DeconvNeck",
    "UpsampleConvNeck",
    "make_heads_dict",
]
