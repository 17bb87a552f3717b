"""Loss stack: CenterNet detection loss + UDA losses.

All losses are pure functions/callables ``(outputs, batch) -> (loss, stats)``
mirroring the reference module contract (losses/centernet.py:31,
losses/entropy.py:14, losses/max_square.py:6, losses/advent.py:14) but with
no in-place mutation: the reference's ``DetectionLoss`` sigmoids
``output['hm']`` in place (losses/centernet.py:34); here the sigmoid is
internal and decode applies its own explicit sigmoid.

``build`` resolves reference-style dotted loss names from experiment YAMLs,
e.g. ``centernet.DetectionLoss`` (configs/defaults.yaml:20).
"""

from centernet_uda_tpu.losses.centernet import (
    DetectionLoss,
    focal_loss,
    reg_l1_loss,
    periodic_reg_l1_loss,
    kps_l1_loss,
)
from centernet_uda_tpu.losses.entropy import EntropyLoss
from centernet_uda_tpu.losses.advent import AdventLoss
from centernet_uda_tpu.losses.max_square import MaxSquareLoss

_REGISTRY = {
    "centernet.DetectionLoss": DetectionLoss,
    "entropy.EntropyLoss": EntropyLoss,
    "advent.AdventLoss": AdventLoss,
    "max_square.MaxSquareLoss": MaxSquareLoss,
}


def build(name: str, **params):
    """Instantiate a loss by its reference-style dotted name."""
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown loss '{name}'; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**params)


__all__ = [
    "build",
    "DetectionLoss",
    "EntropyLoss",
    "AdventLoss",
    "MaxSquareLoss",
    "focal_loss",
    "reg_l1_loss",
    "periodic_reg_l1_loss",
    "kps_l1_loss",
]
