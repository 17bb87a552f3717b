"""End-to-end training slice: tiny COCO split, ResNet-18, 2 epochs on CPU.

Exercises the full spine (driver config #1): config composition -> backend
build -> jitted train step -> validation decode -> COCO evaluation ->
checkpoint save/load -> resume.
"""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from tests.util_fixtures import make_tiny_coco


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    img_dir, anno = make_tiny_coco(
        root / "data", num_images=6, size=(64, 64), num_classes=3
    )
    return root, img_dir, anno


def _write_configs(root: Path, img_dir: Path, anno: Path):
    cfg_dir = root / "configs"
    (cfg_dir / "experiment").mkdir(parents=True, exist_ok=True)
    with open("configs/defaults.yaml") as f:
        defaults = yaml.safe_load(f)
    with open(cfg_dir / "defaults.yaml", "w") as f:
        yaml.safe_dump(defaults, f)
    exp = {
        "experiment": "tiny_e2e",
        "model": {
            "backend": {
                "name": "resnet",
                "params": {
                    "num_layers": 18,
                    "num_classes": 3,
                    "num_keypoints": 0,
                    "rotated_boxes": False,
                    "pretrained": False,
                },
            },
        },
        "datasets": {
            "training": {
                "name": "coco",
                "params": {
                    "image_folder": str(img_dir),
                    "annotation_file": str(anno),
                    "input_size": [64, 64],
                    "augmentation": None,
                    "target_domain_glob": None,
                },
            },
            "validation": {
                "name": "coco",
                "params": {
                    "image_folder": str(img_dir),
                    "annotation_file": str(anno),
                    "input_size": [64, 64],
                },
            },
            "test": None,
        },
        "epochs": 2,
        "batch_size": 2,
        "num_workers": 0,
        "max_detections": 10,
        "tensorboard": {"num_visualizations": 2, "score_threshold": 0.2},
    }
    with open(cfg_dir / "experiment" / "tiny_e2e.yaml", "w") as f:
        yaml.safe_dump(exp, f)
    return cfg_dir


def test_train_two_epochs(tiny_env):
    root, img_dir, anno = tiny_env
    _write_configs(root, img_dir, anno)

    from centernet_uda_tpu import train as train_app

    cwd = os.getcwd()
    os.chdir(root)  # main() resolves configs/ relative to the cwd, like hydra
    try:
        scalars = train_app.main(["experiment=tiny_e2e"])
    finally:
        os.chdir(cwd)

    assert scalars is not None
    assert "training/total_loss" in scalars
    assert np.isfinite(scalars["training/total_loss"])
    assert "MSCOCO_Precision/mAP" in scalars
    # run dir artifacts (hydra-compatible layout)
    run_dir = root / "outputs" / "tiny_e2e"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "model_last.ckpt").exists()


def test_resume_from_checkpoint(tiny_env):
    root, img_dir, anno = tiny_env
    run_dir = root / "outputs" / "tiny_e2e"
    assert (run_dir / "model_last.ckpt").exists()

    cwd = os.getcwd()
    os.chdir(root)
    try:
        from centernet_uda_tpu import train as train_app

        scalars = train_app.main(
            [
                "experiment=tiny_e2e",
                f"resume={run_dir / 'model_last.ckpt'}",
                "epochs=3",
            ]
        )
    finally:
        os.chdir(cwd)
    assert np.isfinite(scalars["training/total_loss"])


def test_eval_covers_full_split_with_partial_batch(tiny_env, monkeypatch):
    """batch_size does not divide the 6-image split (4 -> batches of 4+2pad):
    the padded final batch must still deliver every sample to the evaluator
    exactly once (the reference evaluates the full split, train.py:168-194)."""
    root, img_dir, anno = tiny_env
    _write_configs(root, img_dir, anno)

    from centernet_uda_tpu.evaluation.coco import Evaluator

    seen_ids = []
    orig = Evaluator.add_batch

    def counting_add_batch(self, *args, **kwargs):
        seen_ids.extend(int(i) for i in kwargs["gt_ids"])
        return orig(self, *args, **kwargs)

    monkeypatch.setattr(Evaluator, "add_batch", counting_add_batch)

    from centernet_uda_tpu import train as train_app

    cwd = os.getcwd()
    os.chdir(root)
    try:
        scalars = train_app.main(
            ["experiment=tiny_e2e", "batch_size=4", "epochs=1"])
    finally:
        os.chdir(cwd)

    assert sorted(seen_ids) == [1, 2, 3, 4, 5, 6]
    assert "MSCOCO_Precision/mAP" in scalars
