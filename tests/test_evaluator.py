"""COCO-metric evaluator tests: exact AP values on constructed cases."""

import numpy as np
import pytest

from centernet_uda_tpu.evaluation.coco import Evaluator
from centernet_uda_tpu.evaluation.coco_eval_np import (
    bbox_iou_matrix,
    rotated_iou_matrix,
)


def add_single_image(ev, pred, pred_cls, pred_score, gt, gt_cls, gt_area=None,
                     img_id=1):
    ev.add_batch(
        pred_boxes=[np.array(pred, np.float32)],
        pred_classes=[np.array(pred_cls, np.int32)],
        pred_scores=[np.array(pred_score, np.float32)],
        gt_boxes=[np.array(gt, np.float32)],
        gt_classes=[np.array(gt_cls, np.int32)],
        gt_ids=[img_id],
        gt_areas=[np.array(gt_area if gt_area is not None
                           else [1.0] * len(gt), np.float32)],
        image_shape=(64, 64, 3),
    )


def test_perfect_detection_map_1():
    ev = Evaluator(per_class=True, score_threshold=0.0)
    add_single_image(
        ev,
        pred=[[10, 10, 30, 30]], pred_cls=[0], pred_score=[0.9],
        gt=[[10, 10, 30, 30]], gt_cls=[0], gt_area=[400.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(1.0)
    assert out["MSCOCO_Precision/mAP.50IOU"] == pytest.approx(1.0)
    assert out["MSCOCO_Recall/mAR100"] == pytest.approx(1.0)
    # per-class key present
    assert "MSCOCO_Class_0/Precision/AP" in out


def test_miss_detection_map_0():
    ev = Evaluator(per_class=False, score_threshold=0.0)
    add_single_image(
        ev,
        pred=[[40, 40, 60, 60]], pred_cls=[0], pred_score=[0.9],
        gt=[[0, 0, 20, 20]], gt_cls=[0], gt_area=[400.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(0.0)


def test_iou_threshold_partition():
    """det overlapping gt with IoU=0.605 passes thresholds .50 .55 .60 only."""
    ev = Evaluator(per_class=False, score_threshold=0.0)
    # gt 20x20 at origin; det shifted so IoU ~ 0.6049
    gt = [[0.0, 0.0, 20.0, 20.0]]
    det = [[0.0, 0.0 + 4.9, 20.0, 20.0 + 4.9]]
    iou = bbox_iou_matrix(np.array(det), np.array(gt))[0, 0]
    assert 0.60 < iou < 0.65
    add_single_image(ev, det, [0], [0.9], gt, [0], [400.0])
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(3 / 10)
    assert out["MSCOCO_Precision/mAP.50IOU"] == pytest.approx(1.0)
    assert out["MSCOCO_Precision/mAP.75IOU"] == pytest.approx(0.0)


def test_precision_with_false_positive():
    """High-scoring FP before the TP: AP@.50 = interpolated 0.5."""
    ev = Evaluator(per_class=False, score_threshold=0.0)
    add_single_image(
        ev,
        pred=[[40, 40, 50, 50], [0, 0, 20, 20]],
        pred_cls=[0, 0], pred_score=[0.95, 0.9],
        gt=[[0, 0, 20, 20]], gt_cls=[0], gt_area=[400.0],
    )
    out = ev.evaluate()
    # recall 1.0 reached at precision 1/2
    assert out["MSCOCO_Precision/mAP.50IOU"] == pytest.approx(0.5, abs=0.01)


def test_score_threshold_filters():
    ev = Evaluator(per_class=False, score_threshold=0.5)
    add_single_image(
        ev,
        pred=[[0, 0, 20, 20]], pred_cls=[0], pred_score=[0.3],
        gt=[[0, 0, 20, 20]], gt_cls=[0], gt_area=[400.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(0.0)


def test_area_ranges():
    """small gt contributes to mAP_small only."""
    ev = Evaluator(per_class=False, score_threshold=0.0)
    add_single_image(
        ev,
        pred=[[0, 0, 10, 10]], pred_cls=[0], pred_score=[0.9],
        gt=[[0, 0, 10, 10]], gt_cls=[0], gt_area=[100.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP_small"] == pytest.approx(1.0)
    assert np.isnan(out["MSCOCO_Precision/mAP_large"])


def test_multiclass_independent():
    ev = Evaluator(per_class=True, score_threshold=0.0)
    ev.classes = {0: {"name": "cat"}, 1: {"name": "dog"}}
    add_single_image(
        ev,
        pred=[[0, 0, 20, 20], [30, 30, 50, 50]],
        pred_cls=[0, 1], pred_score=[0.9, 0.9],
        gt=[[0, 0, 20, 20], [31, 31, 50, 50]],
        gt_cls=[0, 1], gt_area=[400.0, 361.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Class_cat/Precision/AP"] == pytest.approx(1.0)
    assert out["MSCOCO_Class_dog/Precision/AP"] > 0.5
    assert 0.5 < out["MSCOCO_Precision/mAP"] <= 1.0


def test_rotated_iou_exact():
    # identical rotated boxes -> IoU 1
    a = np.array([[10, 10, 4, 8, 30.0]])
    assert rotated_iou_matrix(a, a)[0, 0] == pytest.approx(1.0)
    # 90-degree-rotated square == same square
    sq = np.array([[0, 0, 6, 6, 0.0]])
    sq90 = np.array([[0, 0, 6, 6, 90.0]])
    assert rotated_iou_matrix(sq, sq90)[0, 0] == pytest.approx(1.0)
    # known overlap: two axis-aligned rects via the rotated path
    r1 = np.array([[5, 5, 10, 10, 0.0]])
    r2 = np.array([[10, 5, 10, 10, 0.0]])
    # overlap 5x10 = 50, union 150
    assert rotated_iou_matrix(r1, r2)[0, 0] == pytest.approx(50 / 150)


def test_rotated_evaluator():
    ev = Evaluator(per_class=False, score_threshold=0.0)
    ev.use_rotated_boxes = True
    add_single_image(
        ev,
        pred=[[20, 20, 8, 16, 45.0]], pred_cls=[0], pred_score=[0.9],
        gt=[[20, 20, 8, 16, 45.0]], gt_cls=[0], gt_area=[128.0],
    )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(1.0)


def test_multibatch_accumulation_and_reset():
    ev = Evaluator(per_class=False, score_threshold=0.0)
    for img_id in (1, 2, 3):
        add_single_image(
            ev,
            pred=[[0, 0, 20, 20]], pred_cls=[0], pred_score=[0.9],
            gt=[[0, 0, 20, 20]], gt_cls=[0], gt_area=[400.0],
            img_id=img_id,
        )
    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(1.0)
    # reset happened inside evaluate
    assert ev.pred_annos == [] and ev.gt_annos == []
