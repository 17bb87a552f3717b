"""End-to-end variant configs through main(): rotated boxes and UDA.

Exercises the full CLI paths the e2e baseline test doesn't cover: the
rotated-box pipeline (periodic loss + rotated decode + polygon-IoU eval)
and a UDA strategy with a target domain glob.
"""

import os
from pathlib import Path

import numpy as np
import pytest
import yaml

from tests.util_fixtures import make_tiny_coco


def _setup(root: Path, rotated: bool):
    img_dir, anno = make_tiny_coco(
        root / "data", num_images=4, size=(64, 64), num_classes=2,
        rotated=rotated, seed=5,
    )
    cfg_dir = root / "configs"
    (cfg_dir / "experiment").mkdir(parents=True, exist_ok=True)
    with open("configs/defaults.yaml") as f:
        defaults = yaml.safe_load(f)
    with open(cfg_dir / "defaults.yaml", "w") as f:
        yaml.safe_dump(defaults, f)
    return img_dir, anno, cfg_dir


def _dataset_overrides(img_dir, anno, extra=None):
    ov = [
        f"datasets.training.params.image_folder={img_dir}",
        f"datasets.training.params.annotation_file={anno}",
        "datasets.training.params.input_size=[64,64]",
        "datasets.training.params.augmentation=null",
        f"datasets.validation.params.image_folder={img_dir}",
        f"datasets.validation.params.annotation_file={anno}",
        "datasets.validation.params.input_size=[64,64]",
        "epochs=1", "batch_size=2", "num_workers=0", "max_detections=8",
    ]
    return ov + (extra or [])


def _run(root, cfg_dir, argv):
    from centernet_uda_tpu import train as train_app

    cwd = os.getcwd()
    os.chdir(root)
    try:
        return train_app.main(argv)
    finally:
        os.chdir(cwd)


def test_rotated_training_e2e(tmp_path):
    img_dir, anno, cfg_dir = _setup(tmp_path, rotated=True)
    exp = {
        "experiment": "rotated_tiny",
        "model": {
            "backend": {
                "name": "resnet",
                "params": {"num_layers": 18, "num_classes": 2,
                           "rotated_boxes": True, "pretrained": False},
                "loss": {"params": {"periodic": True}},
            },
            "uda": None,
        },
    }
    with open(cfg_dir / "experiment" / "rotated_tiny.yaml", "w") as f:
        yaml.safe_dump(exp, f)

    scalars = _run(tmp_path, cfg_dir, ["experiment=rotated_tiny"]
                   + _dataset_overrides(img_dir, anno))
    assert np.isfinite(scalars["training/total_loss"])
    # rotated eval path (polygon IoU) produced COCO keys
    assert "MSCOCO_Precision/mAP" in scalars


def test_entropy_uda_e2e(tmp_path):
    img_dir, anno, cfg_dir = _setup(tmp_path, rotated=False)
    exp = {
        "experiment": "uda_tiny",
        "model": {
            "backend": {
                "name": "resnet",
                "params": {"num_layers": 18, "num_classes": 2,
                           "pretrained": False},
            },
            "uda": {"EntropyMinimization": {"entropy_weight": 0.001}},
        },
        # UDA strategies forward the target domain in every phase, so the
        # validation set needs a glob too (as in the reference defaults.yaml)
        "datasets": {
            "training": {"params": {
                "target_domain_glob": str(img_dir / "*.png")}},
            "validation": {"params": {
                "target_domain_glob": str(img_dir / "*.png")}},
        },
    }
    with open(cfg_dir / "experiment" / "uda_tiny.yaml", "w") as f:
        yaml.safe_dump(exp, f)

    scalars = _run(tmp_path, cfg_dir, ["experiment=uda_tiny"]
                   + _dataset_overrides(img_dir, anno))
    assert np.isfinite(scalars["training/total_loss"])
    assert "training/entropy_loss" in scalars


def test_keypoints_training_e2e(tmp_path):
    """Keypoint heads end-to-end: KPSL1 loss, kps decode, gt_kps unpacking."""
    img_dir, anno = make_tiny_coco(
        tmp_path / "data", num_images=4, size=(64, 64), num_classes=2,
        num_keypoints=3, seed=6,
    )
    cfg_dir = tmp_path / "configs"
    (cfg_dir / "experiment").mkdir(parents=True, exist_ok=True)
    with open("configs/defaults.yaml") as f:
        defaults = yaml.safe_load(f)
    with open(cfg_dir / "defaults.yaml", "w") as f:
        yaml.safe_dump(defaults, f)
    exp = {
        "experiment": "kps_tiny",
        "model": {
            "backend": {
                "name": "resnet",
                "params": {"num_layers": 18, "num_classes": 2,
                           "num_keypoints": 3, "pretrained": False},
                "loss": {"params": {
                    "kp_weight": 1.0,
                    "kp_indices": [[0, 1], [1, 2]],
                    "kp_distance_weight": 0.5,
                }},
            },
            "uda": None,
        },
    }
    with open(cfg_dir / "experiment" / "kps_tiny.yaml", "w") as f:
        yaml.safe_dump(exp, f)

    scalars = _run(tmp_path, cfg_dir, ["experiment=kps_tiny"]
                   + _dataset_overrides(img_dir, anno))
    assert np.isfinite(scalars["training/total_loss"])
    assert "training/kp_loss" in scalars
    assert np.isfinite(scalars["training/kp_loss"])


def test_test_only_phase(tmp_path):
    """test_only=true: skips training, runs the test phase from a resume."""
    img_dir, anno = _setup(tmp_path, rotated=False)[:2]
    cfg_dir = tmp_path / "configs"
    exp = {
        "experiment": "test_only_tiny",
        "model": {
            "backend": {"name": "resnet",
                        "params": {"num_layers": 18, "num_classes": 2,
                                   "pretrained": False}},
            "uda": None,
        },
        "datasets": {
            "test": {"name": "coco", "params": {
                "image_folder": str(img_dir),
                "annotation_file": str(anno),
                "input_size": [64, 64],
            }},
        },
    }
    with open(cfg_dir / "experiment" / "test_only_tiny.yaml", "w") as f:
        yaml.safe_dump(exp, f)

    scalars = _run(tmp_path, cfg_dir, ["experiment=test_only_tiny",
                                       "test_only=true"]
                   + _dataset_overrides(img_dir, anno))
    assert "test/total_loss" in scalars
    assert np.isfinite(scalars["test/total_loss"])
    assert "MSCOCO_Precision/mAP" in scalars
    # no training happened
    assert "training/total_loss" not in scalars


def test_advent_e2e(tmp_path):
    """ADVENT through main(): discriminator init, dual-optimizer step,
    separate discriminator checkpoint (needs >=128px for the 5x stride-2
    discriminator)."""
    img_dir, anno = make_tiny_coco(
        tmp_path / "data", num_images=4, size=(128, 128), num_classes=2,
        seed=8,
    )
    cfg_dir = tmp_path / "configs"
    (cfg_dir / "experiment").mkdir(parents=True, exist_ok=True)
    with open("configs/defaults.yaml") as f:
        defaults = yaml.safe_load(f)
    with open(cfg_dir / "defaults.yaml", "w") as f:
        yaml.safe_dump(defaults, f)
    exp = {
        "experiment": "advent_tiny",
        "model": {
            "backend": {"name": "resnet",
                        "params": {"num_layers": 18, "num_classes": 2,
                                   "pretrained": False}},
            "uda": {"AdversarialEntropyMinimization": {
                "adversarial_weight": 0.001,
                "optimizer": {"name": "Adam", "params": {"lr": 0.001}},
            }},
        },
        "datasets": {
            "training": {"params": {
                "target_domain_glob": str(img_dir / "*.png")}},
            "validation": {"params": {
                "target_domain_glob": str(img_dir / "*.png")}},
        },
    }
    with open(cfg_dir / "experiment" / "advent_tiny.yaml", "w") as f:
        yaml.safe_dump(exp, f)

    overrides = [
        f"datasets.training.params.image_folder={img_dir}",
        f"datasets.training.params.annotation_file={anno}",
        "datasets.training.params.input_size=[128,128]",
        "datasets.training.params.augmentation=null",
        f"datasets.validation.params.image_folder={img_dir}",
        f"datasets.validation.params.annotation_file={anno}",
        "datasets.validation.params.input_size=[128,128]",
        "epochs=1", "batch_size=2", "num_workers=0", "max_detections=8",
    ]
    scalars = _run(tmp_path, cfg_dir, ["experiment=advent_tiny"] + overrides)
    for key in ("training/dis_source", "training/dis_target",
                "training/dis_fool"):
        assert key in scalars and np.isfinite(scalars[key])
    run_dir = tmp_path / "outputs" / "advent_tiny"
    assert (run_dir / "discriminator.ckpt").exists()
