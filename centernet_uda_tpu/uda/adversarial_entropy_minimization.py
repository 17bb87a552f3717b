"""ADVENT: adversarial entropy minimization.

Functional twin of ``uda/adversarial_entropy_minimization.py``: a 5-layer
stride-2 conv discriminator (ndf=64, LeakyReLU 0.2; reference
``get_fc_discriminator`` :51-68) consumes pixel-wise entropy maps of the
heatmap softmax; the task network is trained to fool it on target images
while the discriminator learns source(0)/target(1).

The reference choreography — 4 ``backward()`` calls and 2 optimizer steps
(:77-152, freeze/unfreeze of D at :85-86/:113-114) — collapses into one
jitted step with two gradient computations:

- backend grads: d/dparams [centernet(source) +
  adversarial_weight * BCE(D(entropy(target_hm)), source_label)] with the
  discriminator parameters held constant (they are simply not differentiated),
- discriminator grads: d/ddisc [BCE(D(entropy(sg(source_hm))), 0)/2 +
  BCE(D(entropy(sg(target_hm))), 1)/2] with ``stop_gradient`` standing in
  for the reference's ``.detach()`` (:117-118).

Both optimizers update in the same step — the exact gradient semantics of
the reference, in one fused XLA program.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from centernet_uda_tpu.losses.advent import AdventLoss
from centernet_uda_tpu.ops.entropy import entropy_map
from centernet_uda_tpu.uda.base import Model
from centernet_uda_tpu.utils import checkpoint as ckpt
from centernet_uda_tpu.utils import optim as optim_util

log = logging.getLogger(__name__)


class FCDiscriminator(nn.Module):
    """5x [Conv k4 s2 p1 (+LeakyReLU 0.2)] domain classifier
    (uda/adversarial_entropy_minimization.py:51-68). NHWC."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if x.shape[1] < 32 or x.shape[2] < 32:
            # five stride-2 convs need >= 32 px; below that the output is
            # ZERO-SIZE and the BCE mean silently becomes NaN (torch raises
            # "Output size is too small" here). With down_ratio 4 this means
            # ADVENT needs >= 128 px inputs.
            raise ValueError(
                f"FCDiscriminator input {x.shape[1]}x{x.shape[2]} is too "
                "small: five stride-2 convs need >= 32x32 (input images >= "
                "128 px at down_ratio 4)")
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                        name=f"conv{i}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="conv4")(x)
        return x


class AdversarialEntropyMinimization(Model):
    requires_target_domain = True

    SOURCE_LABEL = 0.0
    TARGET_LABEL = 1.0

    def __init__(self, adversarial_weight: float, optimizer: Any = None):
        super().__init__()
        self.adversarial_loss = AdventLoss()
        self.adversarial_weight = float(adversarial_weight)
        self.disc_optimizer_cfg = optimizer
        self.discriminator = None
        self.disc_tx = None
        self.disc_base_lr = 0.0
        self.disc_scheduler = None

    # ------------------------------------------------------------------
    def init_done(self):
        super().init_done()

        num_classes = self.backend.num_classes
        self.discriminator = FCDiscriminator()
        rng = jax.random.PRNGKey(int(self.cfg.get("seed", 42)) + 1 if self.cfg else 1)
        h = self._train_input_size()[1] // self.backend.down_ratio
        w = self._train_input_size()[0] // self.backend.down_ratio
        disc_vars = jax.jit(self.discriminator.init)(
            rng, jnp.zeros((1, h, w, num_classes), jnp.float32)
        )

        if self.disc_optimizer_cfg is None:
            name, params = "Adam", {"lr": 1e-3}  # torch Adam() defaults (:31-32)
        else:
            name = self.disc_optimizer_cfg.get("name", "Adam")
            params = self.disc_optimizer_cfg.get("params", {}) or {}
            if hasattr(params, "to_dict"):
                params = params.to_dict()
            sched = self.disc_optimizer_cfg.get("scheduler")
            if sched:
                self.disc_scheduler = optim_util.make_scheduler(
                    sched.get("name"), sched.get("params", {})
                )
        self.disc_base_lr = float(params.get("lr", 1e-3))
        self.disc_tx = optim_util.make_optimizer(name, params)

        self.state = self.state.replace(
            disc_params=disc_vars["params"],
            disc_opt_state=jax.jit(self.disc_tx.init)(disc_vars["params"]),
        )
        self._build_step_fns()  # rebuild with discriminator in the state

    # ------------------------------------------------------------------
    def _losses(self, params, disc_params, batch_stats, batch, train,
                rng=None):
        outputs_src, batch_stats = self._apply_backend(
            params, batch_stats, batch["input"], train, rng
        )
        outputs_tgt, batch_stats = self._apply_backend(
            params, batch_stats, batch["target_domain_input"], train, rng
        )

        task_loss, stats = self.centernet_loss(outputs_src, batch)

        # fool the discriminator: target entropy map labeled as source (:104-109)
        d_tgt = self.discriminator.apply(
            {"params": disc_params}, entropy_map(outputs_tgt["hm"])
        )
        dtf_loss, _ = self.adversarial_loss(d_tgt, self.SOURCE_LABEL)
        dtf_loss = dtf_loss * self.adversarial_weight

        return outputs_src, outputs_tgt, task_loss, dtf_loss, stats, batch_stats

    def _disc_losses(self, disc_params, src_hm, tgt_hm):
        # reference quirk preserved: DetectionLoss sigmoids the SOURCE
        # heatmap in place before the discriminator sees its detached copy
        # (losses/centernet.py:34 -> :117-118), while the target stays raw
        from centernet_uda_tpu.ops.tensor import sigmoid_clamped

        src_in = sigmoid_clamped(jax.lax.stop_gradient(src_hm))
        d_src = self.discriminator.apply(
            {"params": disc_params}, entropy_map(src_in)
        )
        ds_loss, _ = self.adversarial_loss(d_src, self.SOURCE_LABEL)
        ds_loss = ds_loss / 2.0  # (:122)
        d_tgt = self.discriminator.apply(
            {"params": disc_params}, entropy_map(jax.lax.stop_gradient(tgt_hm))
        )
        dt_loss, _ = self.adversarial_loss(d_tgt, self.TARGET_LABEL)
        dt_loss = dt_loss / 2.0  # (:130)
        return ds_loss + dt_loss, (ds_loss, dt_loss)

    def _make_train_step(self):
        tx, disc_tx = self.tx, self.disc_tx
        seed = int(self.cfg.get("seed", 42)) if self.cfg else 42
        base_rng = jax.random.PRNGKey(seed + 7919)

        def train_step(state, batch):
            rng = jax.random.fold_in(base_rng, state.step)

            def task_fn(params):
                (outputs_src, outputs_tgt, task_loss, dtf_loss, stats,
                 new_bs) = self._losses(
                    params, state.disc_params, state.batch_stats, batch, True,
                    rng
                )
                total = task_loss + dtf_loss
                return total, (outputs_src, outputs_tgt, task_loss, dtf_loss,
                               stats, new_bs)

            (_, aux), grads = jax.value_and_grad(task_fn, has_aux=True)(
                state.params
            )
            outputs_src, outputs_tgt, task_loss, dtf_loss, stats, new_bs = aux

            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)

            def disc_fn(disc_params):
                return self._disc_losses(
                    disc_params, outputs_src["hm"], outputs_tgt["hm"]
                )

            (_, (ds_loss, dt_loss)), d_grads = jax.value_and_grad(
                disc_fn, has_aux=True
            )(state.disc_params)
            d_updates, new_d_opt = disc_tx.update(
                d_grads, state.disc_opt_state, state.disc_params
            )
            disc_params = optax.apply_updates(state.disc_params, d_updates)

            stats = dict(stats)
            stats["total_loss"] = task_loss + ds_loss + dt_loss + dtf_loss
            stats["dis_source"] = ds_loss
            stats["dis_target"] = dt_loss
            stats["dis_fool"] = dtf_loss

            self._fold_clamp_stats(
                {"source_domain": outputs_src, "target_domain": outputs_tgt},
                stats)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_bs,
                opt_state=new_opt,
                disc_params=disc_params,
                disc_opt_state=new_d_opt,
            )
            return new_state, stats

        return train_step

    def _make_eval_step(self):
        def eval_step(state, batch):
            (outputs_src, outputs_tgt, task_loss, dtf_loss, stats,
             _) = self._losses(
                state.params, state.disc_params, state.batch_stats, batch, False
            )
            _, (ds_loss, dt_loss) = self._disc_losses(
                state.disc_params, outputs_src["hm"], outputs_tgt["hm"]
            )
            stats = dict(stats)
            stats["total_loss"] = task_loss + ds_loss + dt_loss + dtf_loss
            stats["dis_source"] = ds_loss
            stats["dis_target"] = dt_loss
            stats["dis_fool"] = dtf_loss
            outputs = {"source_domain": outputs_src,
                       "target_domain": outputs_tgt}
            return outputs, stats

        return eval_step

    # ------------------------------------------------------------------
    def epoch_end(self):
        super().epoch_end()
        if self.disc_scheduler is not None and self.state is not None:
            lr = self.disc_scheduler.lr(self.epoch, self.disc_base_lr)
            optim_util.set_learning_rate(self.state.disc_opt_state, lr)

    def save_model(self, path, epoch, with_optimizer: bool = False):
        super().save_model(path, epoch, with_optimizer)
        # separate discriminator checkpoint next to the model (:169-189)
        disc_path = Path(path).with_name("discriminator.ckpt")
        ckpt.save_checkpoint(disc_path, self.state, epoch, with_optimizer)

    def load_model(self, path, resume: bool = False) -> int:
        disc_path = Path(path).with_name("discriminator.ckpt")
        if disc_path.exists():
            state, _ = ckpt.load_checkpoint(disc_path, self.state, resume=resume)
            if state is not None:
                self.state = self.state.replace(
                    disc_params=state.disc_params,
                    disc_opt_state=state.disc_opt_state,
                )
        return super().load_model(path, resume=resume)
