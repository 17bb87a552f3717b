"""Baseline (no-UDA) trainer and the strategy base class.

Functional twin of ``uda/base.py``: the same lifecycle hooks
(``init_done`` / ``epoch_start`` / ``epoch_end`` / ``step`` / ``set_phase`` /
``get_detections`` / ``load_model`` / ``save_model``) so ``train.py`` drives
every strategy uniformly, but the hot path is a pure jitted
``train_step(state, batch) -> (state, outputs, stats)``:

- gradients via ``jax.value_and_grad`` instead of ``loss.backward()``
  (uda/base.py:44-46); subclasses compose multiple loss terms into one
  scalar, which is gradient-equivalent to the reference's sequential
  ``backward()`` calls before a single optimizer step,
- BatchNorm batch_stats are threaded explicitly (``mutable=['batch_stats']``)
  — the reference relies on module-internal mutation,
- the in-place ``output['hm'] = sigmoid(...)`` contract between loss and
  decode (losses/centernet.py:34 → uda/base.py:76) becomes an explicit
  ``apply_sigmoid=True`` in ``decode_detections``,
- device placement is one ``jax.device_put`` of the numpy batch (replacing
  the per-tensor ``.to(device)`` loop, uda/base.py:32-33); under a mesh the
  batch is sharded over the data axis (see ``parallel.mesh``).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from centernet_uda_tpu.ops.decode import decode_detections
from centernet_uda_tpu.uda.state import TrainState
from centernet_uda_tpu.utils import checkpoint as ckpt
from centernet_uda_tpu.utils import optim as optim_util

log = logging.getLogger(__name__)


class Model:
    """No-UDA trainer; subclasses override ``loss_terms`` (and optionally the
    state/step machinery) to add target-domain objectives."""

    # set by train.py before init_done() (mirrors train.py:108-116)
    cfg = None
    backend = None
    centernet_loss = None
    optimizer_cfg: Optional[Dict[str, Any]] = None
    scheduler = None  # utils.optim._Scheduler or None
    mesh = None  # parallel.mesh.MeshContext or None

    def __init__(self):
        self.state: Optional[TrainState] = None
        self.tx = None
        self.base_lr: float = 0.0
        self._train_step = None
        self._eval_step = None
        self._decode = None
        self.epoch: int = 0
        self.is_training = True

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    def init_done(self):
        cfg = self.cfg
        seed = int(cfg.get("seed", 42)) if cfg else 42
        rng = jax.random.PRNGKey(seed)

        input_size = self._train_input_size()
        variables = self.backend.init(rng, input_size)
        if (self.backend.extra or {}).get("pretrained"):
            # backend-level ImageNet trunk weights (the reference downloads
            # them at build time: backends/resnet.py:27-30, dla.py:297-309,
            # mobilenetv2.py:31-36, efficientnet.py:53-56)
            from centernet_uda_tpu.utils import torch_import

            variables = torch_import.load_backbone_pretrained(
                self.backend, variables
            )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        frozen_mask = self._frozen_mask(params)
        opt_name, opt_params = self._optimizer_config()
        self.base_lr = float((opt_params or {}).get("lr", 1e-3))
        self.tx = optim_util.make_optimizer(opt_name, opt_params, frozen_mask)
        # jitted for the same reason as Backend.init: eager optax init
        # dispatches one tiny zeros-op per param leaf
        opt_state = jax.jit(self.tx.init)(params)

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
        )
        self._build_step_fns()
        n_params = sum(x.size for x in jax.tree.leaves(params))
        log.info("initialized %s: %.2fM params", self.backend.name, n_params / 1e6)

    def _train_input_size(self) -> Tuple[int, int]:
        if self.cfg is None:
            return (512, 512)
        params = self.cfg.get_dotted("datasets.training.params", None)
        if params and params.get("input_size"):
            size = params.get("input_size")
            return (int(size[0]), int(size[1]))
        return (512, 512)

    def _optimizer_config(self):
        if self.optimizer_cfg is None:
            return "Adam", {"lr": 5e-5}
        name = self.optimizer_cfg.get("name", "Adam")
        params = self.optimizer_cfg.get("params", {}) or {}
        if hasattr(params, "to_dict"):
            params = params.to_dict()
        return name, params

    def _frozen_mask(self, params):
        """Freeze the backbone subtree when the backend asks for it
        (``freeze_base``, backends/resnet.py:32-34)."""
        if not self.backend.extra.get("freeze_base"):
            return None
        return {
            key: jax.tree.map(lambda _: key == "base", sub)
            for key, sub in params.items()
        }

    def epoch_start(self):
        pass

    def epoch_end(self):
        """Per-epoch LR schedule step (uda/base.py:24-29)."""
        self.epoch += 1
        if self.scheduler is not None and self.state is not None:
            lr = self.scheduler.lr(self.epoch, self.base_lr)
            optim_util.set_learning_rate(self.state.opt_state, lr)

    def set_phase(self, is_training: bool = True):
        self.is_training = is_training

    def maybe_degrade_dcn(self, max_abs_dy: float) -> bool:
        """Runtime fallback when the Pallas vertical-offset clamp saturates.

        The Pallas DCN kernels clamp vertical offsets to
        ``ops.dcn.PALLAS_MAX_SHIFT`` px while the reference CUDA sampler is
        unbounded (src/cuda/dcn_v2_im2col_cuda.cu:25-54). Once the monitored
        ``dcn_max_abs_dy`` stat REACHES the clamp the kernel output is
        already truncating, so this switches the process default to the
        exact XLA formulation and rebuilds the jitted step functions — the
        next step retraces on the unbounded path. Returns True when the
        switch happened.
        """
        from centernet_uda_tpu.ops import dcn as dcn_ops

        if not dcn_ops.get_pallas_default():
            return False
        if max_abs_dy < dcn_ops.PALLAS_MAX_SHIFT:
            return False
        dcn_ops.set_pallas_default(False)
        self._build_step_fns()
        log.error(
            "DCN vertical offsets reached %.1f px — AT the Pallas clamp "
            "(max_shift=%d): sampling was truncating. Switched this run to "
            "the exact XLA DCN path (unbounded offsets) and rebuilt the "
            "step functions; the next step recompiles once.",
            max_abs_dy, dcn_ops.PALLAS_MAX_SHIFT)
        return True

    # ------------------------------------------------------------------
    # step functions
    # ------------------------------------------------------------------
    def _apply_backend(self, params, batch_stats, x, train: bool, rng=None):
        """One backend forward; returns (head dict, new batch_stats)."""
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train and batch_stats:
            outputs, new_state = self.backend.module.apply(
                variables, x, train=True,
                mutable=["batch_stats", "intermediates"], rngs=rngs
            )
            sown = jax.tree.leaves(new_state.get("intermediates", {}))
            if sown:
                # max |dy| across all Pallas DCN layers (clamp monitoring,
                # ops/dcn.py DCN.__call__)
                outputs = dict(outputs)
                outputs["_dcn_max_abs_dy"] = jnp.max(jnp.stack(sown))
            return outputs, new_state["batch_stats"]
        # eval forwards collect the same clamp monitor as training: a
        # test_only/validation run with imported weights whose offsets
        # exceed the Pallas clamp must degrade loudly, never truncate
        # silently (the reference sampler is unbounded,
        # src/cuda/dcn_v2_im2col_cuda.cu:25-54)
        outputs, sown_state = self.backend.module.apply(
            variables, x, train=False, mutable=["intermediates"]
        )
        sown = jax.tree.leaves(sown_state.get("intermediates", {}))
        if sown:
            outputs = dict(outputs)
            outputs["_dcn_max_abs_dy"] = jnp.max(jnp.stack(sown))
        return outputs, batch_stats

    def loss_terms(self, params, batch_stats, batch, train: bool, rng=None):
        """Compute total loss + aux. Subclasses add UDA terms here.

        Returns ``(loss, (outputs_dict, stats, new_batch_stats))``.
        """
        outputs_src, batch_stats = self._apply_backend(
            params, batch_stats, batch["input"], train, rng
        )
        loss, stats = self.centernet_loss(outputs_src, batch)
        outputs = {"source_domain": outputs_src}
        return loss, (outputs, stats, batch_stats)

    @staticmethod
    def _fold_clamp_stats(outputs, stats):
        """Move the per-domain DCN clamp monitors (sown by ``DCN.__call__``,
        ops/dcn.py) out of the head dicts into the stats dict — inside the
        jit, so the train step's only outputs are the new state and scalar
        stats. The head tensors themselves are dead in training (train.py
        consumes only ``stats``); not returning them saves ~10 MB/step of
        HBM writes at 512px/batch 16."""
        clamp = [
            dom.pop("_dcn_max_abs_dy")
            for dom in outputs.values()
            if isinstance(dom, dict) and "_dcn_max_abs_dy" in dom
        ]
        if clamp:
            stats["dcn_max_abs_dy"] = (
                clamp[0] if len(clamp) == 1 else jnp.max(jnp.stack(clamp)))

    def _make_train_step(self):
        tx = self.tx
        seed = int(self.cfg.get("seed", 42)) if self.cfg else 42
        base_rng = jax.random.PRNGKey(seed + 7919)

        def train_step(state: TrainState, batch):
            rng = jax.random.fold_in(base_rng, state.step)

            def loss_fn(params):
                return self.loss_terms(params, state.batch_stats, batch, True,
                                       rng)

            (loss, (outputs, stats, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            stats = dict(stats)
            stats["total_loss"] = loss
            self._fold_clamp_stats(outputs, stats)
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_bs,
                opt_state=new_opt,
            )
            return new_state, stats

        return train_step

    def _make_eval_step(self):
        def eval_step(state: TrainState, batch):
            loss, (outputs, stats, _) = self.loss_terms(
                state.params, state.batch_stats, batch, False
            )
            stats = dict(stats)
            stats["total_loss"] = loss
            self._fold_clamp_stats(outputs, stats)
            return outputs, stats

        return eval_step

    def _build_step_fns(self):
        train_step = self._make_train_step()
        eval_step = self._make_eval_step()
        decode = self._make_decode()
        if self.mesh is not None:
            self._train_step = self.mesh.shard_train_step(train_step)
            self._eval_step = self.mesh.shard_eval_step(eval_step)
            self._decode = jax.jit(decode, static_argnames=())
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._eval_step = jax.jit(eval_step)
            self._decode = jax.jit(decode)

    def _make_decode(self):
        k = int(self.cfg.get("max_detections", 150)) if self.cfg else 100
        rotated = self.backend.rotated_boxes

        def decode(outputs):
            src = outputs
            return decode_detections(
                src["hm"],
                src["wh"],
                src.get("reg"),
                kps=src.get("kps"),
                k=k,
                rotated=rotated,
                apply_sigmoid=True,
            )

        return decode

    # ------------------------------------------------------------------
    # public API used by train.py
    # ------------------------------------------------------------------
    def _device_batch(self, data) -> Dict[str, jnp.ndarray]:
        # gt unpacking stays on the host (uda/base.py:101-123); don't ship it
        batch = {
            k: v
            for k, v in data.items()
            if isinstance(v, (np.ndarray, jax.Array))
            and k not in ("gt_dets", "gt_areas", "gt_kps", "id")
        }
        batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            batch = self.mesh.shard_batch(batch)
        return batch

    #: UDA subclasses forward the target domain in every phase
    #: (uda/entropy_minimization.py:20, defaults.yaml sets the glob on the
    #: validation/test datasets too)
    requires_target_domain = False

    def step(self, data, is_training: bool = True):
        if self.requires_target_domain and "target_domain_input" not in data:
            raise ValueError(
                f"{type(self).__name__} needs a target domain in every "
                "phase; set datasets.<phase>.params.target_domain_glob to a "
                "glob that matches images (the reference configures it for "
                "training, validation and test alike)"
            )
        batch = self._device_batch(data)
        if is_training:
            # the train step returns no head tensors (dead in training;
            # _fold_clamp_stats docstring) — only the donated state + stats
            self.state, stats = self._train_step(self.state, batch)
            return {"stats": stats}
        outputs, stats = self._eval_step(self.state, batch)
        outputs = dict(outputs)
        outputs["stats"] = stats
        return outputs

    def get_detections(self, outputs, batch) -> Dict[str, Any]:
        """Decode + unpack detections for the evaluator (uda/base.py:73-139)."""
        src = outputs["source_domain"]
        down_ratio = self.backend.down_ratio
        rotated = self.backend.rotated_boxes
        has_kps = "kps" in src

        dets = self._decode(src)
        if has_kps:
            dets, kps = dets
            kps = np.asarray(kps) * down_ratio
        dets = np.asarray(dets).copy()
        dets[:, :, :4] *= down_ratio

        ids = np.asarray(batch["id"])
        mask = np.asarray(batch["reg_mask"]) == 1
        dets_gt = np.asarray(batch["gt_dets"]).copy()
        areas_gt = np.asarray(batch["gt_areas"])
        dets_gt[:, :, :4] *= down_ratio
        if has_kps:
            kps_gt = np.asarray(batch["gt_kps"]) * down_ratio

        box_idx, cls_idx = (5, 6) if rotated else (4, 5)

        gt_boxes, gt_clss, gt_ids, gt_areas, gt_kps = [], [], [], [], []
        for i in range(dets_gt.shape[0]):
            det_gt = dets_gt[i, mask[i]]
            gt_boxes.append(det_gt[:, :box_idx])
            gt_clss.append(det_gt[:, cls_idx].astype(np.int32))
            gt_ids.append(ids[i])
            gt_areas.append(areas_gt[i, mask[i]])
            if has_kps:
                gt_kps.append(kps_gt[i, mask[i]])

        out = {
            "pred_boxes": dets[:, :, :box_idx],
            "pred_classes": dets[:, :, cls_idx].astype(np.int32),
            "pred_scores": dets[:, :, box_idx],
            "gt_boxes": gt_boxes,
            "gt_classes": gt_clss,
            "gt_ids": gt_ids,
            "gt_areas": gt_areas,
        }
        if has_kps:
            out["gt_kps"] = gt_kps
            out["pred_kps"] = kps
        return out

    # ------------------------------------------------------------------
    # checkpointing (utils/helper.py:83-147 semantics)
    # ------------------------------------------------------------------
    def load_model(self, path, resume: bool = False) -> int:
        state, epoch = ckpt.load_checkpoint(
            path, self.state, resume=resume, backend_name=self.backend.name
        )
        if state is not None:
            self.state = state
        self.epoch = epoch if resume else 0
        return (epoch + 1) if resume else 1

    def save_model(self, path, epoch: int, with_optimizer: bool = False):
        ckpt.save_checkpoint(path, self.state, epoch, with_optimizer)
