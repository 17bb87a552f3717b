"""Fourier Domain Adaptation trainer (twin of uda/fda.py).

The source batch is restyled by swapping its low-frequency FFT amplitude
with the target batch's (``ops.fda.fda_source_to_target``; reference
machinery at utils/image.py:129-258), then trained with the centernet loss
against the *source* targets plus the eta-entropy loss on the raw target
forward. The FFT mix runs on-device inside the jitted step — fixing the
reference's CPU-side spectrum recomposition (utils/image.py:216-218).
"""

from __future__ import annotations

from centernet_uda_tpu.losses.entropy import EntropyLoss
from centernet_uda_tpu.ops.fda import fda_source_to_target
from centernet_uda_tpu.uda.base import Model


class FDA(Model):
    requires_target_domain = True

    def __init__(self, entropy_weight: float, beta: float, eta: float = 1.5,
                 use_circular: bool = False):
        super().__init__()
        self.entropy_loss = EntropyLoss(eta=eta)
        self.entropy_weight = float(entropy_weight)
        self.beta = float(beta)
        self.eta = eta
        self.use_circular = bool(use_circular)

    def loss_terms(self, params, batch_stats, batch, train, rng=None):
        source = batch["input"]
        target = batch["target_domain_input"]
        mixed = fda_source_to_target(
            source, target, self.beta, self.use_circular
        )

        outputs_src, batch_stats = self._apply_backend(
            params, batch_stats, mixed, train, rng
        )
        outputs_tgt, batch_stats = self._apply_backend(
            params, batch_stats, target, train, rng
        )

        c_loss, c_stats = self.centernet_loss(outputs_src, batch)
        e_loss, e_stats = self.entropy_loss(outputs_tgt, batch)
        e_loss = e_loss * self.entropy_weight

        loss = c_loss + e_loss
        stats = {**c_stats, **e_stats}
        outputs = {"source_domain": outputs_src, "target_domain": outputs_tgt}
        return loss, (outputs, stats, batch_stats)
