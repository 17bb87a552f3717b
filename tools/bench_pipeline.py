#!/usr/bin/env python
"""Host input-pipeline throughput benchmark (SURVEY §7 hard part #5).

Measures the REAL data path — JPEG-decoded images, the reference
augmentation pipeline of ``configs/experiment/baseline.yaml``, native
gaussian target encoding, collation — feeding nothing (pure host rate).
The device step rate (bench.py train_images_per_sec) must stay below this
number or the pipeline caps training.

Env knobs: IMAGES (default 96), SIZE (512), BATCH (16), WORKERS (8),
MODE (thread | process | sync), AUG (1 to enable the augmentation list).

Prints one JSON line: {"pipeline_images_per_sec": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


AUG_LIST = [
    {"Fliplr": {"p": 0.5}},
    {"Sometimes": {"p": 0.3,
                   "then_list": [{"GaussianBlur": {"sigma": [0.0, 2.0]}}]}},
    {"LinearContrast": {"alpha": [0.75, 1.25]}},
    {"Multiply": {"mul": [0.8, 1.2]}},
    {"Affine": {"scale": [0.9, 1.1], "translate_percent": [-0.05, 0.05]}},
]


def main():
    from util_fixtures import make_tiny_coco

    from centernet_uda_tpu.data.coco import Dataset
    from centernet_uda_tpu.data.loader import DataLoader

    n_images = int(os.environ.get("IMAGES", 96))
    size = int(os.environ.get("SIZE", 512))
    batch = int(os.environ.get("BATCH", 16))
    workers = int(os.environ.get("WORKERS", 8))
    mode = os.environ.get("MODE", "thread")
    use_aug = os.environ.get("AUG", "1") == "1"

    root = Path(tempfile.mkdtemp(prefix="bench_pipe_"))
    make_tiny_coco(root, num_images=n_images, size=(size, size),
                   num_classes=6, max_objects=16, seed=0)

    ds = Dataset(
        image_folder=str(root / "images"),
        annotation_file=str(root / "annotations" / "instances.json"),
        input_size=[size, size],
        augmentation=AUG_LIST if use_aug else None,
        num_classes=6,
        max_detections=150,
    )

    loader = DataLoader(ds, batch_size=batch, shuffle=True,
                        num_workers=(0 if mode == "sync" else workers),
                        worker_mode=("thread" if mode == "sync" else mode),
                        drop_last=True, prefetch=4)

    # warm epoch (JIT-free host path; warms page cache + imgaug)
    for _ in loader:
        break

    n = 0
    t0 = time.perf_counter()
    epochs = 0
    while time.perf_counter() - t0 < 15.0:
        for b in loader:
            n += len(b["input"])
        epochs += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "pipeline_images_per_sec": round(n / dt, 2),
        "mode": mode, "workers": workers, "batch": batch, "size": size,
        "aug": use_aug, "epochs": epochs,
    }))


if __name__ == "__main__":
    main()
