"""Max-squares UDA (twin of uda/max_squares_minimization.py).

Source centernet loss + ``-mean(softmax(hm)^2)/2 * max_squares_weight`` on
the target domain; the reference's two backwards + one step
(uda/max_squares_minimization.py:38-41) is gradient-equivalent to one
backward of the summed loss.
"""

from __future__ import annotations

from centernet_uda_tpu.losses.max_square import MaxSquareLoss
from centernet_uda_tpu.uda.base import Model


class MaxSquaresMinimization(Model):
    requires_target_domain = True

    def __init__(self, max_squares_weight: float):
        super().__init__()
        self.max_squares_loss = MaxSquareLoss()
        self.max_squares_weight = float(max_squares_weight)

    def loss_terms(self, params, batch_stats, batch, train, rng=None):
        outputs_src, batch_stats = self._apply_backend(
            params, batch_stats, batch["input"], train, rng
        )
        outputs_tgt, batch_stats = self._apply_backend(
            params, batch_stats, batch["target_domain_input"], train, rng
        )

        s_loss, s_stats = self.centernet_loss(outputs_src, batch)
        t_loss, t_stats = self.max_squares_loss(outputs_tgt, batch)
        t_loss = t_loss * self.max_squares_weight

        loss = s_loss + t_loss
        stats = {**s_stats, **t_stats}
        outputs = {"source_domain": outputs_src, "target_domain": outputs_tgt}
        return loss, (outputs, stats, batch_stats)
