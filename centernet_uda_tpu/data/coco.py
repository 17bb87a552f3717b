"""COCO-format detection dataset with CenterNet target encoding.

Behavioral twin of ``datasets/coco.py`` with TPU-native layout choices:

- images are returned HWC float32 (NHWC batches feed TPU convs directly;
  the reference transposes to CHW at datasets/coco.py:162),
- heatmaps are (H, W, num_classes),
- every other key (``ind``, ``reg_mask``, ``wh``, ``reg``, ``gt_dets``,
  ``gt_areas``, ``kps``, ``gt_kps``, ``kp_reg_mask``, ``id``,
  ``target_domain_input``) matches the reference encoding bit-for-bit
  (datasets/coco.py:164-233,299-376): per-object gaussian with the CornerNet
  radius, ``ind = y * W + x`` at the int-truncated center, ``reg`` the
  sub-pixel remainder, fixed ``max_detections`` padding (static shapes are
  XLA-friendly).

Augmentation uses the imgaug-compatible registry in
``centernet_uda_tpu.data.augment`` driven by the same YAML schema.
"""

from __future__ import annotations

import logging
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

import cv2
import numpy as np
from PIL import Image

from centernet_uda_tpu.data import augment as aug
from centernet_uda_tpu.data.box import get_annotation_with_angle, rotate_bbox_float
from centernet_uda_tpu.data.coco_api import COCO
from centernet_uda_tpu.ops.gaussian import draw_gaussian, gaussian_radius

log = logging.getLogger(__name__)


class Dataset:
    def __init__(
        self,
        image_folder: str,
        annotation_file: str,
        input_size=(512, 512),
        target_domain_glob: Union[None, str, Sequence[str]] = None,
        num_classes: int = 80,
        num_keypoints: int = 0,
        rotated_boxes: bool = False,
        mean=(0.40789654, 0.44719302, 0.47026115),
        std=(0.28863828, 0.27408164, 0.27809835),
        augmentation=None,
        augment_target_domain: bool = False,
        max_detections: int = 150,
        down_ratio: int = 4,
        seed: Optional[int] = None,
        use_native_encoder: bool = True,
    ):
        self.image_folder = Path(image_folder)
        self.coco = COCO(annotation_file)
        self.images = self.coco.getImgIds()
        self.use_rotated_boxes = bool(rotated_boxes)
        self.max_detections = int(max_detections)
        self.down_ratio = int(down_ratio)
        self.input_size = tuple(int(v) for v in input_size)  # (W, H) square in practice
        self.mean = np.array(mean, np.float32).reshape(1, 1, 3)
        self.std = np.array(std, np.float32).reshape(1, 1, 3)
        self.num_classes = int(num_classes)
        self.num_keypoints = int(num_keypoints)
        self.augment_target_domain = bool(augment_target_domain)
        self.string_id_mapping: Dict[str, int] = {}
        self.rng = np.random.RandomState(seed)
        self.use_native_encoder = bool(use_native_encoder)

        # contiguous category remap, 1..num_classes -> 0..num_classes-1
        # (datasets/coco.py:45-48)
        self.cat_mapping = {v: i for i, v in enumerate(range(1, num_classes + 1))}
        self.classes = {
            y: self.coco.cats[x] if x in self.coco.cats else ""
            for x, y in self.cat_mapping.items()
        }
        assert len(self.input_size) == 2

        if isinstance(target_domain_glob, str):
            self.target_domain_files = sorted(glob(target_domain_glob))
        elif isinstance(target_domain_glob, (list, tuple)):
            self.target_domain_files = []
            for pattern in target_domain_glob:
                self.target_domain_files.extend(sorted(glob(str(pattern))))
        else:
            self.target_domain_files = []

        self.augmentation: Optional[aug.Sequential] = None
        if augmentation:
            self.augmentation = aug.Sequential(
                aug.instantiate_augmenters(augmentation)
            )

        self.resize = aug.Resize((self.input_size[1], self.input_size[0]))
        self.resize_out = aug.Resize(
            (self.input_size[1] // self.down_ratio,
             self.input_size[0] // self.down_ratio)
        )

        log.info(
            "found %d samples for target domain", len(self.target_domain_files)
        )

    def __len__(self) -> int:
        return len(self.images)

    # ------------------------------------------------------------------
    def _normalize(self, img: np.ndarray) -> np.ndarray:
        if self.use_native_encoder and img.dtype == np.uint8:
            from centernet_uda_tpu import native

            out = native.normalize_image(img, self.mean, self.std)
            if out is not None:
                return out
        img = img.astype(np.float32) / 255.0
        return (img - self.mean) / self.std

    def _load_image(self, path) -> np.ndarray:
        # cv2 decodes JPEG ~2-3x faster than PIL (libjpeg-turbo + no
        # Image object overhead); PIL stays as the fallback for anything
        # cv2 can't read (e.g. exotic formats, truncated files).
        # IGNORE_ORIENTATION: cv2 applies EXIF rotation by default but
        # PIL (and the reference, datasets/coco.py:96) does NOT —
        # annotations are authored against the stored pixel grid.
        img = cv2.imread(
            str(path), cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        return np.array(Image.open(path).convert("RGB"))

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        img_id = self.images[index]
        file_name = self.coco.loadImgs(ids=[img_id])[0]["file_name"]
        ann_ids = self.coco.getAnnIds(imgIds=[img_id])
        anns = self.coco.loadAnns(ids=ann_ids)
        num_objs = min(len(anns), self.max_detections)
        img = self._load_image(self.image_folder / file_name)

        if self.use_rotated_boxes:
            ret = self._get_rotated(img, anns, num_objs)
        else:
            ret = self._get_default(img, anns, num_objs)

        if isinstance(img_id, str):
            mapped = self.string_id_mapping.setdefault(
                img_id, 1 + len(self.string_id_mapping)
            )
            img_id = mapped
        ret["id"] = np.int64(img_id)

        if self.target_domain_files:
            tfile = self.target_domain_files[
                self.rng.randint(len(self.target_domain_files))
            ]
            timg = self._load_image(tfile)
            if self.augmentation is not None and self.augment_target_domain:
                timg, _, _ = self.augmentation(timg, rng=self.rng)
            timg, _, _ = self.resize(timg, rng=self.rng)
            ret["target_domain_input"] = self._normalize(timg)

        return ret

    # ------------------------------------------------------------------
    def _alloc_targets(self, wh_dim: int, gt_dim: int):
        output_h = self.input_size[1] // self.down_ratio
        output_w = self.input_size[0] // self.down_ratio
        t = {
            "hm": np.zeros((output_h, output_w, self.num_classes), np.float32),
            "wh": np.zeros((self.max_detections, wh_dim), np.float32),
            "reg": np.zeros((self.max_detections, 2), np.float32),
            "ind": np.zeros((self.max_detections,), np.int64),
            "reg_mask": np.zeros((self.max_detections,), np.uint8),
            "gt_dets": np.zeros((self.max_detections, gt_dim), np.float32),
            "gt_areas": np.zeros((self.max_detections,), np.float32),
        }
        if self.num_keypoints > 0:
            t["kps"] = np.zeros(
                (self.max_detections, self.num_keypoints * 2), np.float32
            )
            t["gt_kps"] = np.zeros(
                (self.max_detections, self.num_keypoints, 2), np.float32
            )
            t["kp_reg_mask"] = np.zeros(
                (self.max_detections, self.num_keypoints * 2), np.uint8
            )
        return t, output_h, output_w

    def _encode_keypoints(self, t, k, ann, kpts_obj, ct_int, output_w, output_h):
        """Center-relative keypoint offsets + validity (datasets/coco.py:217-228)."""
        valid = np.array(ann["keypoints"]).reshape(-1, 3)[:, -1]
        for i in range(self.num_keypoints):
            p = kpts_obj[i]
            t["kps"][k, i * 2] = p[0] - ct_int[0]
            t["kps"][k, i * 2 + 1] = p[1] - ct_int[1]
            # NOTE: the reference checks is_out_of_image((output_w, output_w))
            # — width twice (datasets/coco.py:224-225); we check both axes.
            inside = 0 <= p[0] < output_w and 0 <= p[1] < output_h
            is_valid = valid[i] == 2 and inside
            t["kp_reg_mask"][k, i * 2] = int(is_valid)
            t["kp_reg_mask"][k, i * 2 + 1] = int(is_valid)
            t["gt_kps"][k, i] = p[0], p[1]

    def _get_default(self, img, anns, num_objs):
        boxes = []
        kpts = []
        for k in range(num_objs):
            ann = anns[k]
            x, y, w, h = ann["bbox"]
            boxes.append([x, y, x + w, y + h])
            if self.num_keypoints > 0:
                if "keypoints" not in ann:
                    ann["keypoints"] = np.zeros((3 * self.num_keypoints,))
                kp = np.array(ann["keypoints"], np.float32).reshape(-1, 3)[:, :2]
                kpts.append(kp)

        boxes = (
            np.array(boxes, np.float32) if boxes else np.zeros((0, 4), np.float32)
        )
        kp_flat = (
            np.concatenate(kpts, axis=0)
            if kpts
            else np.zeros((0, 2), np.float32)
        )

        if self.augmentation is not None:
            img, boxes, kp_flat = self.augmentation(
                img, boxes, kp_flat, rng=self.rng
            )
        img, boxes, kp_flat = self.resize(img, boxes, kp_flat, rng=self.rng)

        inp = self._normalize(img)

        if len(boxes):
            scale = 1.0 / self.down_ratio
            boxes_out = boxes * scale
            kp_out = kp_flat * scale if len(kp_flat) else kp_flat
        else:
            boxes_out = boxes
            kp_out = kp_flat

        # hot path: C++ encoder (gaussian splat + target fills) when there
        # are no keypoints to attach; identical math to the loop below
        if self.use_native_encoder and self.num_keypoints == 0:
            from centernet_uda_tpu import native

            if native.available():
                classes = np.array(
                    [self.cat_mapping[anns[k]["category_id"]]
                     for k in range(num_objs)],
                    np.int32,
                )
                areas = np.array(
                    [anns[k].get("area", -1.0) for k in range(num_objs)],
                    np.float32,
                )
                t = native.encode_targets(
                    boxes_out[:num_objs].reshape(-1, 4), classes, areas,
                    self.input_size[1] // self.down_ratio,
                    self.input_size[0] // self.down_ratio,
                    self.num_classes, self.max_detections,
                )
                t["input"] = inp
                return t

        t, output_h, output_w = self._alloc_targets(wh_dim=2, gt_dim=6)

        for k in range(num_objs):
            ann = anns[k]
            bbox = boxes_out[k].copy()
            cls_id = int(self.cat_mapping[ann["category_id"]])

            bbox[[0, 2]] = np.clip(bbox[[0, 2]], 0, output_w - 1)
            bbox[[1, 3]] = np.clip(bbox[[1, 3]], 0, output_h - 1)
            h, w = bbox[3] - bbox[1], bbox[2] - bbox[0]
            if h > 0 and w > 0:
                radius = max(0, int(gaussian_radius((np.ceil(h), np.ceil(w)))))
                ct = np.array(
                    [(bbox[0] + bbox[2]) / 2, (bbox[1] + bbox[3]) / 2], np.float32
                )
                ct_int = ct.astype(np.int32)
                draw_gaussian(t["hm"][:, :, cls_id], ct_int, radius)
                t["wh"][k] = w, h
                t["ind"][k] = ct_int[1] * output_w + ct_int[0]
                t["reg"][k] = ct - ct_int
                t["reg_mask"][k] = 1
                t["gt_dets"][k] = (
                    ct[0] - w / 2, ct[1] - h / 2, ct[0] + w / 2, ct[1] + h / 2,
                    1, cls_id,
                )
                if self.num_keypoints > 0:
                    obj_kps = kp_out[
                        k * self.num_keypoints : (k + 1) * self.num_keypoints
                    ]
                    self._encode_keypoints(
                        t, k, ann, obj_kps, ct_int, output_w, output_h
                    )
                t["gt_areas"][k] = ann.get("area", w * h)

        t["input"] = inp
        return t

    def _get_rotated(self, img, anns, num_objs):
        """Rotated-box path (datasets/coco.py:261-401): boxes ride through the
        augmentation as 4 corner points and are re-fit with cv2.minAreaRect."""
        corner_pts = []
        obj_kpts = []
        for k in range(num_objs):
            ann = anns[k]
            ann_rot = get_annotation_with_angle(ann)
            corners = rotate_bbox_float(*ann_rot)  # (4, 2) float
            corner_pts.append(corners)
            if self.num_keypoints > 0:
                if "keypoints" not in ann:
                    ann["keypoints"] = np.zeros((3 * self.num_keypoints,))
                kp = np.array(ann["keypoints"], np.float32).reshape(-1, 3)[:, :2]
                obj_kpts.append(kp)

        pts = (
            np.concatenate(corner_pts, axis=0).astype(np.float32)
            if corner_pts
            else np.zeros((0, 2), np.float32)
        )
        n_box_pts = len(pts)
        if obj_kpts:
            pts = np.concatenate([pts] + obj_kpts, axis=0)

        if self.augmentation is not None:
            img, _, pts = self.augmentation(img, None, pts, rng=self.rng)
        img, _, pts = self.resize(img, None, pts, rng=self.rng)

        inp = self._normalize(img)

        t, output_h, output_w = self._alloc_targets(wh_dim=3, gt_dim=7)

        pts_out = pts * (1.0 / self.down_ratio) if len(pts) else pts
        box_pts, kp_pts = pts_out[:n_box_pts], pts_out[n_box_pts:]
        assert num_objs == len(box_pts) // 4

        for k in range(num_objs):
            ann = anns[k]
            corners = box_pts[k * 4 : k * 4 + 4].copy()
            corners[:, 0] = np.clip(corners[:, 0], 0, output_w - 1)
            corners[:, 1] = np.clip(corners[:, 1], 0, output_h - 1)
            (cv_cx, cv_cy), (cv_w, cv_h), cv_angle = cv2.minAreaRect(
                corners.astype(np.float32)
            )
            if cv_w == 0 or cv_h == 0:
                continue

            cx, cy, w, h, angle = get_annotation_with_angle(
                {"rbbox": np.array([cv_cx, cv_cy, cv_w, cv_h, cv_angle])}
            )
            ct = np.array((cx, cy))
            cls_id = int(self.cat_mapping[ann["category_id"]])

            if h > 0 and w > 0:
                radius = max(0, int(gaussian_radius((np.ceil(h), np.ceil(w)))))
                ct_int = ct.astype(np.int32)
                draw_gaussian(t["hm"][:, :, cls_id], ct_int, radius)
                t["wh"][k] = w, h, angle
                t["ind"][k] = ct_int[1] * output_w + ct_int[0]
                t["reg"][k] = ct - ct_int
                t["reg_mask"][k] = 1
                t["gt_dets"][k] = (ct[0], ct[1], w, h, angle, 1, cls_id)
                if self.num_keypoints > 0:
                    okp = kp_pts[
                        k * self.num_keypoints : (k + 1) * self.num_keypoints
                    ]
                    self._encode_keypoints(
                        t, k, ann, okp, ct_int, output_w, output_h
                    )
                t["gt_areas"][k] = ann.get("area", w * h)

        t["input"] = inp
        return t
