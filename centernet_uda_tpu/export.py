"""Model export: serving artifacts from a trained experiment.

Twin of the reference ``export.py`` (ONNX opset 11 via torch.onnx,
export.py:86-132) re-targeted at TPU/XLA deployment formats:

- **StableHLO** via ``jax.export`` — the portable XLA serving format
  (loadable from JAX, TF, IREE and PJRT runtimes),
- optional **TensorFlow SavedModel** via ``jax2tf`` when TF is available
  (from which TFLite/ONNX conversions exist off-device).

The exported function mirrors the reference's ``CenterNet`` wrapper
(export.py:19-56): backend forward -> sigmoid(+clamp) heatmap ->
``decode_detections`` -> boxes scaled by ``down_ratio``, returning
``(boxes, scores, classes[, kps])``; ``--without-decode`` exports raw heads
(the ``-wd`` flag, export.py:150-153). Artifact naming matches
``centernet_<name>_<H>x<W>[_wd]`` (export.py:98-100).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from centernet_uda_tpu import config as config_lib
from centernet_uda_tpu import losses as loss_registry
from centernet_uda_tpu import models as model_registry
from centernet_uda_tpu import uda as uda_registry
from centernet_uda_tpu.ops.decode import decode_detections
from centernet_uda_tpu.ops.tensor import sigmoid_clamped

log = logging.getLogger("export")


def build_model(cfg, checkpoint_path: str):
    """Build backend + restore weights (export.py:59-83)."""
    backend_params = cfg.model.backend.params.to_dict()
    backend = model_registry.build(cfg.model.backend.name, **backend_params)

    trainer = uda_registry.Model()
    trainer.cfg = cfg
    trainer.backend = backend
    loss_params = cfg.model.backend.loss.get("params")
    loss_params = loss_params.to_dict() if loss_params else {}
    trainer.centernet_loss = loss_registry.build(
        cfg.model.backend.loss.name, **loss_params
    )
    trainer.optimizer_cfg = {"name": "Adam", "params": {"lr": 1e-4}}
    trainer.init_done()
    trainer.load_model(checkpoint_path)
    return backend, trainer.state


def make_serving_fn(backend, state, input_size: Tuple[int, int],
                    max_detections: int = 100, with_decode: bool = True,
                    nms_size: int = 3):
    """A jittable (batch, H, W, 3) -> detections function."""
    module = backend.module
    params = state.params
    batch_stats = state.batch_stats
    rotated = backend.rotated_boxes
    down_ratio = backend.down_ratio

    def serve(x):
        outputs = module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        if not with_decode:
            return outputs
        hm = sigmoid_clamped(outputs["hm"])
        dets = decode_detections(
            hm, outputs["wh"], outputs.get("reg"), kps=outputs.get("kps"),
            k=max_detections, rotated=rotated, nms_size=nms_size,
        )
        def scale_boxes(dets):
            boxes = dets[..., : 5 if rotated else 4]
            if rotated:  # the angle column (deg) must not be scaled
                boxes = boxes.at[..., :4].multiply(down_ratio)
            else:
                boxes = boxes * down_ratio
            return boxes

        if isinstance(dets, tuple):
            dets, kps = dets
            kps = kps * down_ratio
            return (scale_boxes(dets), dets[..., -2], dets[..., -1], kps)
        return (scale_boxes(dets), dets[..., -2], dets[..., -1])

    return serve


def export_stablehlo(serve_fn, input_shape, out_path: Path) -> Path:
    """Serialize the serving function as StableHLO (jax.export)."""
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(serve_fn))(
        jax.ShapeDtypeStruct(input_shape, jnp.float32)
    )
    data = exported.serialize()
    out_path = out_path.with_suffix(".stablehlo")
    out_path.write_bytes(data)
    log.info("wrote %s (%d bytes)", out_path, len(data))
    return out_path


def export_optimized_hlo(serve_fn, input_shape, out_path: Path) -> Path:
    """Serialize the XLA-optimized HLO — the ``_smpl`` analog.

    The reference runs onnx-simplifier over the exported graph
    (``export.py:113-132``, ``*_smpl.onnx``). onnx/tf2onnx/onnxsim are not
    installable in this image (see PARITY.md), so the equivalent
    "optimized for deployment" artifact here is the post-optimization HLO
    from the XLA pipeline itself: constant folding, fusion and layout
    assignment already applied for the compiling backend.
    """
    lowered = jax.jit(serve_fn).lower(
        jax.ShapeDtypeStruct(input_shape, jnp.float32)
    )
    compiled = lowered.compile()
    text = compiled.as_text()
    out_path = out_path.with_suffix(".opt.hlo")
    out_path.write_text(text)
    log.info("wrote %s (%d bytes, optimized for %s)", out_path, len(text),
             jax.devices()[0].platform)
    return out_path


def export_savedmodel(serve_fn, input_shape, out_path: Path) -> Optional[Path]:
    """Optional TF SavedModel via jax2tf (for TFLite/TF-Serving pipelines).

    Registers a named ``serving_default`` signature (the stock TF-Serving
    contract) with named float32 outputs — ``boxes``/``scores``/``classes``
    [/``keypoints``] in decode mode, the raw head names otherwise — so the
    artifact is loadable by ``tf.saved_model.load`` and servable without
    knowing the exporting framework.
    """
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf
    except Exception as exc:  # pragma: no cover
        log.warning("tensorflow/jax2tf unavailable (%s); skipping SavedModel",
                    exc)
        return None

    def named_outputs(x):
        out = serve_fn(x)
        if isinstance(out, dict):  # raw heads (--without-decode)
            return out
        names = ("boxes", "scores", "classes", "keypoints")
        return dict(zip(names, out))

    tf_fn = tf.function(
        jax2tf.convert(named_outputs, with_gradient=False),
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name="input")],
        autograph=False,
    )
    module = tf.Module()
    module.serve = tf_fn
    out_dir = out_path.with_suffix(".savedmodel")
    tf.saved_model.save(
        module, str(out_dir),
        signatures={"serving_default": tf_fn.get_concrete_function()},
    )
    log.info("wrote %s", out_dir)
    return out_dir


def export_model(cfg, checkpoint_path: str, input_size, max_detections: int,
                 with_decode: bool, nms_size: int, batch_size: int = 1,
                 formats=("stablehlo", "savedmodel"), out_dir: str = "."):
    backend, state = build_model(cfg, checkpoint_path)
    h, w = int(input_size[1]), int(input_size[0])
    serve = make_serving_fn(backend, state, (w, h), max_detections,
                            with_decode, nms_size)
    input_shape = (batch_size, h, w, 3)

    name = f"centernet_{cfg.model.backend.name}_{h}x{w}"
    if not with_decode:
        name += "_wd"
    base = Path(out_dir) / name

    artifacts = []
    if "stablehlo" in formats:
        artifacts.append(export_stablehlo(serve, input_shape, base))
    if "opthlo" in formats:
        artifacts.append(export_optimized_hlo(serve, input_shape, base))
    if "savedmodel" in formats:
        path = export_savedmodel(serve, input_shape, base)
        if path:
            artifacts.append(path)
    return artifacts


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export a trained experiment for serving"
    )
    parser.add_argument("-e", "--experiment", required=True,
                        help="experiment name (reads outputs/<e>/config.yaml)")
    parser.add_argument("-i", "--input-size", type=int, nargs=2,
                        default=[512, 512], metavar=("W", "H"))
    parser.add_argument("-l", "--load", choices=["last", "best"],
                        default="last")
    parser.add_argument("-wd", "--without-decode", action="store_true",
                        help="export raw head outputs (no decode)")
    parser.add_argument("-b", "--batch-size", type=int, default=1)
    parser.add_argument("--nms", type=int, default=3, help="peak-NMS window")
    parser.add_argument("--max-detections", type=int, default=100)
    parser.add_argument("--formats", nargs="+",
                        default=["stablehlo", "savedmodel"],
                        choices=["stablehlo", "opthlo", "savedmodel"])
    parser.add_argument("--outputs-dir", default="outputs")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    exp_dir = Path(args.outputs_dir) / args.experiment
    cfg = config_lib.load_composed(str(exp_dir / "config.yaml"))
    checkpoint = exp_dir / f"model_{args.load}.ckpt"

    return export_model(
        cfg, str(checkpoint), args.input_size, args.max_detections,
        not args.without_decode, args.nms, args.batch_size,
        tuple(args.formats), str(exp_dir),
    )


if __name__ == "__main__":
    main()
