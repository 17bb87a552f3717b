"""Direct entropy minimization UDA (twin of uda/entropy_minimization.py).

Two forwards — source (supervised centernet loss) + target domain
(normalized Shannon entropy of the heatmap softmax x ``entropy_weight``) —
combined into one scalar. The reference runs two separate ``backward()``
calls before a single optimizer step (uda/entropy_minimization.py:29-33);
summing the losses yields the identical gradient in one backward.
"""

from __future__ import annotations

from centernet_uda_tpu.losses.entropy import EntropyLoss
from centernet_uda_tpu.uda.base import Model


class EntropyMinimization(Model):
    requires_target_domain = True

    def __init__(self, entropy_weight: float):
        super().__init__()
        self.entropy_loss = EntropyLoss()
        self.entropy_weight = float(entropy_weight)

    def loss_terms(self, params, batch_stats, batch, train, rng=None):
        outputs_src, batch_stats = self._apply_backend(
            params, batch_stats, batch["input"], train, rng
        )
        # the second forward sees the stats updated by the first, matching
        # the reference's sequential module calls
        outputs_tgt, batch_stats = self._apply_backend(
            params, batch_stats, batch["target_domain_input"], train, rng
        )

        c_loss, c_stats = self.centernet_loss(outputs_src, batch)
        e_loss, e_stats = self.entropy_loss(outputs_tgt, batch)
        e_loss = e_loss * self.entropy_weight

        loss = c_loss + e_loss
        stats = {**c_stats, **e_stats}
        outputs = {"source_domain": outputs_src, "target_domain": outputs_tgt}
        return loss, (outputs, stats, batch_stats)
