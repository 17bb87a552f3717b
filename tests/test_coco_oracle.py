"""Cross-validate the production COCO evaluator against the test-only
pycocotools-transliteration oracle (see coco_oracle.py) on randomized
scenarios covering the protocol's edge cases: crowd regions, area-range
boundaries, score ties, >maxDet detections, images with no gt or no
detections, and categories present on only one side.
"""

import numpy as np
import pytest

from coco_oracle import OracleEval
from centernet_uda_tpu.evaluation.coco_eval_np import COCOEval
from centernet_uda_tpu.evaluation.coco import Evaluator


def _rand_box(rng, lo=0.0, hi=512.0, big=False):
    """Random x1y1x2y2 with a size distribution hitting all area ranges."""
    scale = rng.choice([8.0, 24.0, 64.0, 160.0] if big else [8.0, 24.0, 64.0])
    x1 = rng.uniform(lo, hi - scale)
    y1 = rng.uniform(lo, hi - scale)
    w = rng.uniform(0.3, 1.5) * scale
    h = rng.uniform(0.3, 1.5) * scale
    return [x1, y1, x1 + w, y1 + h]


def _make_scenario(seed, num_images=6, num_cats=3, crowd_prob=0.2,
                   dets_per_img=25, tie_scores=True):
    rng = np.random.RandomState(seed)
    gts, dts = [], []
    for img in range(1, num_images + 1):
        if img == num_images:  # one image with detections but no gt
            n_gt = 0
        else:
            n_gt = rng.randint(0, 7)
        for _ in range(n_gt):
            box = _rand_box(rng, big=True)
            area_mode = rng.rand()
            # sometimes decouple the stored area from the box (gt areas come
            # from the dataset, e.g. polygon areas)
            area = ((box[2] - box[0]) * (box[3] - box[1])
                    if area_mode < 0.7 else float(rng.uniform(10, 10000)))
            gts.append({
                "image_id": img,
                "category_id": int(rng.randint(0, num_cats)),
                "bbox": box,
                "area": float(area),
                "iscrowd": int(rng.rand() < crowd_prob),
            })
        if img == 1:  # one image with gt but no detections
            continue
        for _ in range(dets_per_img):
            # half the detections perturb a gt box (real matches), half are
            # random (false positives)
            if n_gt and rng.rand() < 0.5:
                src = gts[-rng.randint(1, n_gt + 1)]["bbox"]
                jitter = rng.uniform(-8, 8, 4)
                box = [src[0] + jitter[0], src[1] + jitter[1],
                       max(src[0] + jitter[0] + 2, src[2] + jitter[2]),
                       max(src[1] + jitter[1] + 2, src[3] + jitter[3])]
            else:
                box = _rand_box(rng)
            score = float(rng.rand())
            if tie_scores:
                score = round(score, 1)  # force heavy score ties
            dts.append({
                "image_id": img,
                "category_id": int(rng.randint(0, num_cats)),
                "bbox": box,
                "area": float((box[2] - box[0]) * (box[3] - box[1])),
                "score": score,
            })
    return gts, dts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_tables_match_oracle(seed):
    gts, dts = _make_scenario(seed)
    ours = COCOEval(gts, dts)
    ours.evaluate_and_accumulate()
    oracle = OracleEval(gts, dts).accumulate()
    assert ours.cat_ids == OracleEval(gts, dts).cat_ids
    np.testing.assert_allclose(
        ours.eval["precision"], oracle["precision"], atol=1e-10,
        err_msg="precision table diverges from the pycocotools protocol",
    )
    np.testing.assert_allclose(
        ours.eval["recall"], oracle["recall"], atol=1e-10,
        err_msg="recall table diverges from the pycocotools protocol",
    )


def test_tables_match_oracle_many_dets():
    """>100 detections per image exercises the maxDet truncation path."""
    gts, dts = _make_scenario(7, num_images=3, dets_per_img=120,
                              crowd_prob=0.3)
    ours = COCOEval(gts, dts)
    ours.evaluate_and_accumulate()
    oracle = OracleEval(gts, dts).accumulate()
    np.testing.assert_allclose(ours.eval["precision"], oracle["precision"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], oracle["recall"],
                               atol=1e-10)


def test_crowd_iou_is_expected_iou():
    """A det fully inside a big crowd gt has IoU 1 against it (intersection
    over det area), so it matches the crowd and is ignored — not a FP."""
    gt = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 200, 200],
         "area": 40000.0, "iscrowd": 1},
        {"image_id": 1, "category_id": 0, "bbox": [300, 300, 340, 340],
         "area": 1600.0, "iscrowd": 0},
    ]
    dt = [
        {"image_id": 1, "category_id": 0, "bbox": [300, 300, 340, 340],
         "area": 1600.0, "score": 0.9},
        # inside the crowd: union-IoU would be 0.04, expected-IoU is 1.0
        {"image_id": 1, "category_id": 0, "bbox": [50, 50, 90, 90],
         "area": 1600.0, "score": 0.8},
    ]
    ours = COCOEval(gt, dt)
    ours.evaluate_and_accumulate()
    oracle = OracleEval(gt, dt).accumulate()
    np.testing.assert_allclose(ours.eval["precision"], oracle["precision"],
                               atol=1e-10)
    # mAP must be perfect: the non-crowd gt is matched, the crowd det ignored
    _, mean_ap = ours.summarize(ap=True)
    assert mean_ap == pytest.approx(1.0)


def test_evaluator_end_to_end_matches_oracle():
    """Drive the full Evaluator (add_batch conversion included) and compare
    its mAP against the oracle on the converted annotations."""
    rng = np.random.RandomState(11)
    ev = Evaluator(per_class=True, score_threshold=0.05)
    ev.classes = {0: {"name": "a"}, 1: {"name": "b"}}

    all_gt, all_dt = [], []
    for step in range(3):
        k, g = 12, 4
        pred_boxes = np.zeros((2, k, 4))
        pred_scores = rng.rand(2, k)
        pred_classes = rng.randint(0, 2, (2, k))
        gt_boxes, gt_classes, gt_ids, gt_areas = [], [], [], []
        for b in range(2):
            boxes = np.array([_rand_box(rng, big=True) for _ in range(g)])
            gt_boxes.append(boxes)
            gt_classes.append(rng.randint(0, 2, g))
            gt_ids.append(step * 2 + b + 100)
            gt_areas.append(
                (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            )
            for j in range(k):
                src = boxes[j % g]
                pred_boxes[b, j] = src + rng.uniform(-6, 6, 4)
                pred_boxes[b, j, 2] = max(pred_boxes[b, j, 2],
                                          pred_boxes[b, j, 0] + 1)
                pred_boxes[b, j, 3] = max(pred_boxes[b, j, 3],
                                          pred_boxes[b, j, 1] + 1)
        ev.add_batch(pred_boxes, pred_classes, pred_scores,
                     gt_boxes, gt_classes, gt_ids, gt_areas)
        all_gt.extend(ev.gt_annos[len(all_gt):])
        all_dt.extend(ev.pred_annos[len(all_dt):])

    oracle = OracleEval(all_gt, all_dt).accumulate()
    prec = oracle["precision"][:, :, :, 0, 2]
    want_map = float(np.mean(prec[prec > -1]))

    out = ev.evaluate()
    assert out["MSCOCO_Precision/mAP"] == pytest.approx(want_map, abs=1e-9)
