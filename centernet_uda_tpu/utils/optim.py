"""Optimizer and LR-scheduler registries (torch-name compatible).

The reference resolves ``torch.optim.<Name>`` and
``torch.optim.lr_scheduler.<Name>`` by reflection (train.py:88-99) from the
experiment YAML. This module maps the same names onto optax so configs run
unchanged. Schedulers in the reference step **per epoch**
(uda/base.py:28-29); here they are host-side ``lr(epoch)`` functions and the
trainer injects the new learning rate into the optax state at epoch
boundaries (``optax.inject_hyperparams``).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Sequence

import optax


def _adam(lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
          weight_decay: float = 0.0, **_):
    # torch Adam's weight_decay is COUPLED L2 (added to the gradient before
    # the moment estimation), not AdamW's decoupled decay
    if weight_decay:
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps),
        )
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


def _adamw(lr: float, betas=(0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.01, **_):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay)


def _sgd(lr: float, momentum: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, **_):
    tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


def _rmsprop(lr: float, alpha: float = 0.99, eps: float = 1e-8,
             momentum: float = 0.0, **_):
    return optax.rmsprop(lr, decay=alpha, eps=eps, momentum=momentum or None)


_OPTIMIZERS: Dict[str, Callable] = {
    "Adam": _adam,
    "AdamW": _adamw,
    "SGD": _sgd,
    "RMSprop": _rmsprop,
}


def make_optimizer(name: str, params: Optional[Dict[str, Any]] = None,
                   frozen_mask=None) -> optax.GradientTransformation:
    """Build an optax transformation from a torch-style optimizer config.

    ``params`` are the YAML ``optimizer.params`` (``lr`` spelled as in torch).
    The learning rate is injected as a mutable hyperparameter so per-epoch
    schedulers can update it without retracing.

    ``frozen_mask``: optional pytree-prefix mask (True = frozen) realizing the
    reference's ``requires_grad`` filtering (train.py:89, ``freeze_base`` at
    backends/resnet.py:32-34) functionally.
    """
    if name not in _OPTIMIZERS:
        raise KeyError(f"unknown optimizer '{name}'; available: {sorted(_OPTIMIZERS)}")
    kwargs = dict(params or {})
    if hasattr(kwargs, "to_dict"):
        kwargs = kwargs.to_dict()
    lr = float(kwargs.pop("lr", 1e-3))
    if "betas" in kwargs:
        kwargs["betas"] = tuple(kwargs["betas"])

    def factory(learning_rate):
        return _OPTIMIZERS[name](learning_rate, **kwargs)

    tx = optax.inject_hyperparams(factory)(learning_rate=lr)
    if frozen_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), frozen_mask),
            tx,
        )
    return tx


def set_learning_rate(opt_state, lr) -> bool:
    """Update the injected learning rate inside an optax state.

    The ``hyperparams`` dict of ``InjectHyperparamsState`` is mutated in
    place (dicts are mutable pytree nodes), which preserves the state's
    structure for donation/jit. Returns True if a learning rate was found.
    """
    if hasattr(opt_state, "hyperparams") and "learning_rate" in opt_state.hyperparams:
        import jax.numpy as jnp

        old = opt_state.hyperparams["learning_rate"]
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=getattr(old, "dtype", jnp.float32)
        )
        return True
    if isinstance(opt_state, tuple):  # chain/masked states are (Named)tuples
        return any(set_learning_rate(s, lr) for s in opt_state)
    return False


def get_learning_rate(opt_state) -> Optional[float]:
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    if isinstance(opt_state, tuple):
        for s in opt_state:
            lr = get_learning_rate(s)
            if lr is not None:
                return lr
    return None


# --- per-epoch schedulers (torch lr_scheduler names) -----------------------


class _Scheduler:
    """Per-epoch learning rate, absolute: ``lr(epoch, base_lr)``.

    Most torch schedulers are pure multipliers of the base lr and implement
    ``factor(epoch)``; schedulers with an absolute floor (CosineAnnealingLR's
    ``eta_min``) override ``lr`` directly — a multiplier can't express
    ``eta_min + (base - eta_min) * f(t)``.
    """

    def factor(self, epoch: int) -> float:  # pragma: no cover
        raise NotImplementedError

    def lr(self, epoch: int, base_lr: float) -> float:
        return base_lr * self.factor(epoch)


class MultiStepLR(_Scheduler):
    def __init__(self, milestones: Sequence[int], gamma: float = 0.1, **_):
        self.milestones = sorted(int(m) for m in milestones)
        self.gamma = float(gamma)

    def factor(self, epoch: int) -> float:
        passed = sum(1 for m in self.milestones if epoch >= m)
        return self.gamma ** passed


class StepLR(_Scheduler):
    def __init__(self, step_size: int, gamma: float = 0.1, **_):
        self.step_size = int(step_size)
        self.gamma = float(gamma)

    def factor(self, epoch: int) -> float:
        return self.gamma ** (epoch // self.step_size)


class ExponentialLR(_Scheduler):
    def __init__(self, gamma: float, **_):
        self.gamma = float(gamma)

    def factor(self, epoch: int) -> float:
        return self.gamma ** epoch


class CosineAnnealingLR(_Scheduler):
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form:
    ``eta_min + (base - eta_min) * (1 + cos(pi * t / T_max)) / 2``.

    ``eta_min`` is an ABSOLUTE lr floor (three reference experiment YAMLs set
    it, e.g. configs/experiment/adversarial_entropy_minimization_dla.yaml:33),
    so this scheduler overrides ``lr`` rather than ``factor``. Not clamped at
    T_max: torch's recursion continues the cosine (period 2*T_max) past it.
    """

    def __init__(self, T_max: int, eta_min: float = 0.0, **_):
        self.t_max = int(T_max)
        self.eta_min = float(eta_min)

    def lr(self, epoch: int, base_lr: float) -> float:
        cos = (1 + math.cos(math.pi * epoch / self.t_max)) / 2
        return self.eta_min + (base_lr - self.eta_min) * cos

    def factor(self, epoch: int) -> float:
        # multiplier view; exact only for eta_min == 0 (use ``lr`` otherwise)
        return (1 + math.cos(math.pi * epoch / self.t_max)) / 2


_SCHEDULERS = {
    "MultiStepLR": MultiStepLR,
    "StepLR": StepLR,
    "ExponentialLR": ExponentialLR,
    "CosineAnnealingLR": CosineAnnealingLR,
}


def make_scheduler(name: Optional[str], params: Optional[Dict[str, Any]] = None
                   ) -> Optional[_Scheduler]:
    if name is None:
        return None
    if name not in _SCHEDULERS:
        raise KeyError(f"unknown scheduler '{name}'; available: {sorted(_SCHEDULERS)}")
    kwargs = dict(params or {})
    if hasattr(kwargs, "to_dict"):
        kwargs = kwargs.to_dict()
    return _SCHEDULERS[name](**kwargs)
