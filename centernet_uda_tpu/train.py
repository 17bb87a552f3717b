"""Training application.

Functional twin of the reference ``train.py``: composes the config
(defaults + ``experiment=<name>`` overlay + CLI overrides), builds
backend / optimizer / scheduler / UDA trainer / loss / datasets /
evaluators / TensorBoard logger through the registries, then runs the
epoch loop with train / validation / test phases, metric aggregation and
last/best checkpointing (train.py:70-271).

TPU specifics: the trainer's hot path is one jitted (or pjit-sharded)
``train_step``; host->device transfer is a single batch ``device_put``;
multi-chip data parallelism is enabled by ``gpu``-style config ``mesh``
(or automatically when multiple devices are visible).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path

import numpy as np

from centernet_uda_tpu import config as config_lib
from centernet_uda_tpu import data as data_registry
from centernet_uda_tpu import evaluation as eval_registry
from centernet_uda_tpu import losses as loss_registry
from centernet_uda_tpu import models as model_registry
from centernet_uda_tpu import uda as uda_registry
from centernet_uda_tpu.data.loader import DataLoader
from centernet_uda_tpu.utils import optim as optim_util
from centernet_uda_tpu.utils.meters import AverageMeter
from centernet_uda_tpu.utils.tensorboard import TensorboardLogger

log = logging.getLogger("uda")


def load_datasets(cfg, down_ratio: int, rotated_boxes: bool,
                  full_batches_only: bool = False):
    """Build train/val/test loaders with merged defaults (train.py:17-67).

    Eval-batch policy: without a device mesh the final partial batch runs
    EXACTLY as-is (like the reference, train.py:168-194 — one extra
    compile for the tail shape). With a mesh (``full_batches_only``) the
    tail batch must stay divisible by the data axis, so it is PADDED by
    repeating samples (``_num_real`` recorded): detections are sliced
    back to the real samples before the evaluator (exact mAP over the
    full split); the scalar loss meters fold in the padded-batch mean,
    whose per-sample weights differ from uniform by at most 1/batch_size
    (an approximation only mesh runs pay).

    Multi-host note: with ``num_shards > 1`` processes the loader gives
    each host ``len(dataset) // num_shards`` samples — the final
    ``len % num_shards`` samples are not evaluated by any host.
    """
    defaults = {
        "max_detections": cfg.max_detections,
        "down_ratio": down_ratio,
        "rotated_boxes": rotated_boxes,
        "num_classes": cfg.model.backend.params.num_classes,
        "num_keypoints": cfg.model.backend.params.get("num_keypoints", 0),
        "mean": list(cfg.normalize.mean),
        "std": list(cfg.normalize.std),
    }

    import jax

    def build_loader(section, shuffle, drop_last, pad_last=False):
        params = {**section.params.to_dict(), **defaults}
        dataset = data_registry.build(section.name, **params)
        loader = DataLoader(
            dataset,
            batch_size=int(cfg.batch_size),
            shuffle=shuffle,
            num_workers=int(cfg.get("num_workers", 0)),
            worker_mode=str(cfg.get("worker_mode", "thread")),
            drop_last=drop_last,
            pad_last=pad_last,
            seed=int(cfg.get("seed", 42)),
            # multi-host: every process loads a disjoint shard
            # (the reference's DataLoader is single-host only)
            shard_id=jax.process_index(),
            num_shards=jax.process_count(),
        )
        return dataset, loader

    if full_batches_only:
        log.info("device mesh active: the final partial eval batch is "
                 "padded (detections sliced back before the evaluator) so "
                 "every batch divides the data axis; loss meters carry a "
                 "<=1/batch_size per-sample weight skew on that one batch")

    val_ds, val_loader = build_loader(cfg.datasets.validation, False, False,
                                      pad_last=full_batches_only)
    log.info("Found %d samples in validation dataset", len(val_ds))

    train_ds, train_loader = build_loader(cfg.datasets.training, True, True)
    log.info("Found %d samples in training dataset", len(train_ds))

    test_loader = None
    if "test" in cfg.datasets and cfg.datasets.get("test"):
        test_ds, test_loader = build_loader(cfg.datasets.test, False, False,
                                            pad_last=full_batches_only)
        log.info("Found %d samples in test dataset", len(test_ds))

    return train_loader, val_loader, test_loader


def build_trainer(cfg):
    """Assemble backend + loss + optimizer + UDA strategy (train.py:85-134)."""
    backend_params = cfg.model.backend.params.to_dict()
    if str(cfg.get("precision", "float32")) == "bfloat16":
        import jax.numpy as jnp

        backend_params.setdefault("dtype", jnp.bfloat16)

    from centernet_uda_tpu.models import common as model_common
    from centernet_uda_tpu.ops import dcn as dcn_ops

    dcn_ops.set_pallas_default(cfg.get("dcn_impl", "auto"))
    # BN statistics scope (SURVEY §7 hard part #4): "global" (default) or
    # "replica" to reproduce DataParallel's per-GPU BN for mAP comparisons
    model_common.set_bn_groups(cfg.get("bn_sync", "global"))
    backend = model_registry.build(cfg.model.backend.name, **backend_params)

    uda_cfg = cfg.model.get("uda")
    if uda_cfg:
        method = list(uda_cfg.keys())[0]
        uda_params = uda_cfg[method]
        if hasattr(uda_params, "to_dict"):
            uda_params = uda_params.to_dict()
        trainer = uda_registry.build(method, **(uda_params or {}))
    else:
        trainer = uda_registry.Model()

    loss_cfg = cfg.model.backend.loss
    loss_params = loss_cfg.get("params")
    loss_params = loss_params.to_dict() if loss_params else {}
    trainer.centernet_loss = loss_registry.build(loss_cfg.name, **loss_params)

    trainer.cfg = cfg
    trainer.backend = backend
    trainer.optimizer_cfg = cfg.optimizer.to_dict()
    sched_cfg = cfg.optimizer.get("scheduler")
    if sched_cfg:
        trainer.scheduler = optim_util.make_scheduler(
            sched_cfg.get("name"), sched_cfg.get("params", {})
        )

    mesh_cfg = cfg.get("mesh")
    n_data = int(mesh_cfg.get("data", 0)) if mesh_cfg else 0
    # `gpu: [0, 1]` (the reference's DataParallel switch, train.py:76-78)
    # maps onto an N-chip data mesh
    gpu_cfg = cfg.get("gpu")
    if not n_data and isinstance(gpu_cfg, (list, tuple)):
        n_data = len(gpu_cfg)
    import jax

    if n_data > jax.device_count():
        log.warning(
            "requested %d-way data parallelism but only %d device(s) "
            "available; running single-device", n_data, jax.device_count(),
        )
        n_data = 0
    if n_data and int(cfg.get("batch_size", 1)) % n_data != 0:
        log.warning(
            "batch_size %s is not divisible by the %d-way data mesh; "
            "running single-device", cfg.get("batch_size"), n_data,
        )
        n_data = 0
    if n_data or _should_auto_mesh(int(cfg.get("batch_size", 1))):
        from centernet_uda_tpu.parallel.mesh import MeshContext

        trainer.mesh = MeshContext.create(data_parallel=n_data or None)
        log.info("training over mesh: %s", trainer.mesh.mesh)

    return trainer


def _should_auto_mesh(batch_size: int) -> bool:
    """Shard automatically over all devices when the batch divides evenly."""
    import jax

    n = jax.device_count()
    return n > 1 and batch_size % n == 0


def _run_phase(trainer, loader, evaluators, tb_logger, stats, epoch, tag,
               is_training, profile_steps=0):
    from centernet_uda_tpu.ops import dcn as dcn_ops

    trainer.set_phase(is_training)
    n_batches = 0
    t0 = time.time()
    n_images = 0
    profiling = False
    clamp_warned = False

    # Training stats stay ON DEVICE and are fetched in batches of
    # STATS_FLUSH steps: a per-step float() would block the host on every
    # step's completion and collapse the async dispatch pipeline (the
    # reference's .item() per step does exactly that). Eval keeps per-step
    # sync — get_detections needs the outputs anyway.
    STATS_FLUSH = 8
    pending = []  # [(stats_dict_of_device_arrays, n_real)]

    def flush_pending():
        nonlocal clamp_warned
        degraded = False
        for dev_stats, n_w in pending:
            for k, v in dev_stats.items():
                log_key = f"{tag}/{k}"
                meter = stats.get(log_key)
                if not isinstance(meter, AverageMeter):
                    meter = AverageMeter(name=k)
                value = float(v)
                meter.update(value, n_w)
                stats[log_key] = meter
                if k == "dcn_max_abs_dy":
                    # AT the clamp: the numbers are already truncating —
                    # auto-degrade to the exact XLA path (uda/base.py)
                    degraded |= trainer.maybe_degrade_dcn(value)
                    if (not clamp_warned
                            and value >= 0.9 * dcn_ops.PALLAS_MAX_SHIFT):
                        clamp_warned = True
                        log.warning(
                            "DCN vertical offsets reached %.1f px — within "
                            "10%% of the Pallas clamp (max_shift=%d). The "
                            "run auto-switches to the exact XLA path if the "
                            "clamp is hit; consider dcn_impl=xla outright.",
                            value, dcn_ops.PALLAS_MAX_SHIFT)
        pending.clear()
        return degraded

    for data in loader:
        # jax.profiler trace of the first N train steps of the first epoch
        # (SURVEY §5: the reference has no tracing at all)
        if profile_steps and is_training and epoch == 1 and n_batches == 0:
            import jax

            jax.profiler.start_trace("profile")
            profiling = True
        outputs = trainer.step(data, is_training=is_training)
        n_batches += 1
        # a padded final eval batch carries the real sample count
        n_real = int(data.get("_num_real", len(data["input"])))
        n_images += n_real
        if profiling and n_batches >= profile_steps:
            import jax

            jax.tree.map(lambda v: v.block_until_ready(),
                         outputs["stats"])
            jax.profiler.stop_trace()
            profiling = False
            log.info("wrote profiler trace for %d steps to profile/",
                     profile_steps)

        pending.append((outputs["stats"], n_real))
        if not is_training or len(pending) >= STATS_FLUSH:
            if flush_pending() and not is_training:
                # this batch's outputs were computed on the truncating
                # Pallas kernels — recompute on the exact XLA path the
                # degrade just installed so its detections are correct
                # (the truncated stats were already logged; one batch of
                # loss meters is noise, the detections are not)
                outputs = trainer.step(data, is_training=False)

        if not is_training:
            detections = trainer.get_detections(outputs, data)
            if n_real < len(data["input"]):
                # drop padded duplicates before they reach the evaluator
                detections = {k: v[:n_real] for k, v in detections.items()}
            detections["image_shape"] = data["input"].shape[1:]
            for ev in evaluators:
                ev.add_batch(**detections)
            if tb_logger is not None:
                tb_logger.log_detections(data, detections, epoch, tag=tag)

    if profiling:
        import jax

        jax.profiler.stop_trace()

    flush_pending()
    dt = time.time() - t0
    if n_batches:
        stats[f"{tag}/images_per_sec"] = n_images / dt
    return stats


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = config_lib.compose(argv)

    run_dir = config_lib.setup_run_dir(cfg)
    # anchor user-supplied paths before entering the run dir (hydra leaves
    # relative paths dangling after its chdir; we resolve them instead)
    for key in ("pretrained", "resume"):
        value = cfg.get(key)
        if value and not Path(str(value)).is_absolute():
            cfg[key] = str(Path(str(value)).resolve())
    os.chdir(run_dir)  # hydra-compatible: checkpoints/logs land in the run dir

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
    )

    # multi-host pods: bring up the jax distributed runtime before any
    # device access (pjit then spans all hosts; collectives ride ICI/DCN)
    if cfg.get("distributed") or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())

    np.random.seed(int(cfg.get("seed", 42)))

    trainer = build_trainer(cfg)
    backend = trainer.backend

    train_loader, val_loader, test_loader = load_datasets(
        cfg, down_ratio=backend.down_ratio,
        rotated_boxes=backend.rotated_boxes,
        full_batches_only=trainer.mesh is not None,
    )

    tb_logger = TensorboardLogger(cfg, val_loader.dataset.classes)

    evaluators = []
    for e in cfg.evaluation:
        ev_params = cfg.evaluation[e]
        ev_params = ev_params.to_dict() if hasattr(ev_params, "to_dict") else {}
        ev = eval_registry.build(
            e, score_threshold=float(cfg.get("score_threshold", 0.0)), **ev_params
        )
        ev.classes = tb_logger.classes
        ev.num_workers = int(cfg.get("num_workers", 0))
        ev.use_rotated_boxes = bool(backend.rotated_boxes)
        evaluators.append(ev)

    trainer.init_done()

    start_epoch = 1
    if cfg.get("pretrained") and not cfg.get("resume"):
        start_epoch = trainer.load_model(cfg.pretrained)
    elif cfg.get("resume"):
        start_epoch = trainer.load_model(cfg.resume, True)

    stats: dict = {}
    best = float("inf") if cfg.save_best_metric.mode == "min" else -float("inf")
    scalars: dict = {}
    epoch = start_epoch

    if not cfg.get("test_only", False):
        for epoch in range(start_epoch, int(cfg.epochs) + 1):
            trainer.epoch_start()
            stats = _run_phase(
                trainer, train_loader, evaluators, None, stats, epoch,
                "training", True,
                profile_steps=int(cfg.get("profile_steps", 0) or 0),
            )
            log.info(
                "epoch %d training done (loss %.4f, %.1f img/s)",
                epoch,
                stats.get("training/total_loss").avg
                if "training/total_loss" in stats else float("nan"),
                stats.get("training/images_per_sec", 0.0),
            )

            if epoch % int(cfg.get("eval_at_n_epoch", 1)) != 0:
                continue

            stats = _run_phase(
                trainer, val_loader, evaluators, tb_logger, stats, epoch,
                "validation", False,
            )
            for ev in evaluators:
                result = ev.evaluate()
                stats = {**stats, **result}

            scalars = {}
            for k, s in stats.items():
                if isinstance(s, AverageMeter):
                    scalars[k] = s.avg
                    s.reset()
                else:
                    scalars[k] = s
                tb_logger.log_stat(k, scalars[k], epoch)

            trainer.epoch_end()
            tb_logger.reset()
            trainer.save_model("model_last.ckpt", epoch, True)

            metric_name = cfg.save_best_metric.name
            if metric_name not in scalars:
                log.error(
                    "Metric %s not valid, valid values are %s",
                    metric_name, " ".join(map(str, scalars)),
                )
                return scalars

            current = scalars[metric_name]
            if (cfg.save_best_metric.mode == "min" and best > current) or (
                cfg.save_best_metric.mode == "max" and best < current
            ):
                trainer.save_model("model_best.ckpt", epoch, True)
                best = current
                log.info(
                    "Save best model with %s of %.4f", metric_name, current
                )

    if test_loader is not None:
        stats = _run_phase(
            trainer, test_loader, evaluators, tb_logger, stats, epoch,
            "test", False,
        )
        for ev in evaluators:
            result = ev.evaluate()
            stats = {**stats, **result}
        for k, s in stats.items():
            value = s.avg if isinstance(s, AverageMeter) else s
            scalars[k] = value
            tb_logger.log_stat(k, value, epoch)
        tb_logger.reset()

    return scalars


if __name__ == "__main__":
    main()
