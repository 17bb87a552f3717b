"""Shared test fixtures: synthetic tiny COCO dataset on disk."""

import json
from pathlib import Path

import numpy as np
from PIL import Image


def make_tiny_coco(
    root: Path,
    num_images: int = 4,
    size=(64, 64),
    num_classes: int = 3,
    max_objects: int = 4,
    seed: int = 0,
    rotated: bool = False,
    num_keypoints: int = 0,
):
    """Write a tiny COCO-format dataset; returns (image_dir, anno_file)."""
    rng = np.random.RandomState(seed)
    img_dir = root / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    anno_dir = root / "annotations"
    anno_dir.mkdir(parents=True, exist_ok=True)

    images, annotations = [], []
    ann_id = 1
    w, h = size
    for img_id in range(1, num_images + 1):
        arr = rng.randint(0, 255, (h, w, 3), np.uint8)
        n_obj = rng.randint(1, max_objects + 1)
        for _ in range(n_obj):
            bw = rng.randint(8, max(w // 2, 9))
            bh = rng.randint(8, max(h // 2, 9))
            x = rng.randint(0, w - bw)
            y = rng.randint(0, h - bh)
            cat = int(rng.randint(1, num_classes + 1))
            # paint the object so there is signal to learn
            arr[y : y + bh, x : x + bw] = [60 * cat % 255, 30 * cat % 255, 200]
            ann = {
                "id": ann_id,
                "image_id": img_id,
                "category_id": cat,
                "bbox": [float(x), float(y), float(bw), float(bh)],
                "area": float(bw * bh),
                "iscrowd": 0,
            }
            if rotated:
                angle = float(rng.uniform(-80, 80))
                ann["rbbox"] = [
                    float(x + bw / 2), float(y + bh / 2),
                    float(bw), float(bh), angle,
                ]
            if num_keypoints:
                kps = []
                for _ in range(num_keypoints):
                    kps.extend([
                        float(rng.uniform(x, x + bw)),
                        float(rng.uniform(y, y + bh)),
                        2,  # visible
                    ])
                ann["keypoints"] = kps
                ann["num_keypoints"] = num_keypoints
            annotations.append(ann)
            ann_id += 1
        fname = f"img_{img_id:03d}.png"
        Image.fromarray(arr).save(img_dir / fname)
        images.append(
            {"id": img_id, "file_name": fname, "width": w, "height": h}
        )

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i, "name": f"class_{i}"} for i in range(1, num_classes + 1)
        ],
    }
    anno_file = anno_dir / "instances.json"
    with open(anno_file, "w") as f:
        json.dump(coco, f)
    return img_dir, anno_file
