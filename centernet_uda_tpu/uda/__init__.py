"""UDA trainer registry.

The reference resolves ``uda.<Method>`` by reflection (train.py:101-107)
with method names coming from the ``model.uda`` YAML mapping's first key.
Exports mirror ``uda/__init__.py:1-4``.
"""

from centernet_uda_tpu.uda.base import Model
from centernet_uda_tpu.uda.entropy_minimization import EntropyMinimization
from centernet_uda_tpu.uda.max_squares_minimization import MaxSquaresMinimization
from centernet_uda_tpu.uda.adversarial_entropy_minimization import (
    AdversarialEntropyMinimization,
)
from centernet_uda_tpu.uda.fda import FDA

_REGISTRY = {
    # bare class names as used in experiment YAML `model.uda` keys
    # (e.g. configs/experiment/entropy_minimization.yaml:6)
    "Model": Model,
    "EntropyMinimization": EntropyMinimization,
    "MaxSquaresMinimization": MaxSquaresMinimization,
    "AdversarialEntropyMinimization": AdversarialEntropyMinimization,
    "FDA": FDA,
    # dotted module.Class spellings also resolve (train.py:104 semantics)
    "base.Model": Model,
    "entropy_minimization.EntropyMinimization": EntropyMinimization,
    "max_squares_minimization.MaxSquaresMinimization": MaxSquaresMinimization,
    "adversarial_entropy_minimization.AdversarialEntropyMinimization":
        AdversarialEntropyMinimization,
    "fda.FDA": FDA,
}


def build(name: str, **params) -> Model:
    """Build a UDA trainer by its reference-style dotted name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown UDA method '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**params)


__all__ = [
    "build",
    "Model",
    "EntropyMinimization",
    "MaxSquaresMinimization",
    "AdversarialEntropyMinimization",
    "FDA",
]
