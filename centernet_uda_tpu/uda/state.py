"""Training state pytree.

The reference keeps mutable training state spread over a torch module, an
optimizer, a scheduler and ad-hoc attributes on ``uda.base.Model``
(uda/base.py:10-29). The TPU rebuild collapses all of it into one immutable
pytree threaded through pure jitted step functions; the ADVENT
discriminator's second parameter set / optimizer
(uda/adversarial_entropy_minimization.py:25-48) are additional leaves of the
same state so a single ``train_step`` can update both networks.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # ADVENT discriminator (None for every other trainer)
    disc_params: Optional[Any] = None
    disc_opt_state: Optional[Any] = None
