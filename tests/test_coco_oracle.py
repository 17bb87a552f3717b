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


def _assert_tables_match(gts, dts):
    ours = COCOEval(gts, dts)
    ours.evaluate_and_accumulate()
    oracle = OracleEval(gts, dts).accumulate()
    np.testing.assert_allclose(ours.eval["precision"], oracle["precision"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], oracle["recall"],
                               atol=1e-10)
    return ours


def test_crowd_gt_absorbs_multiple_detections():
    """One crowd region can be matched by MANY detections (the matcher
    skips the gtm>0 check for crowds, pycocotools evaluateImg), and every
    one of them must be ignored — not counted as FPs — while a real gt in
    the same image still matches normally."""
    gt = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 300, 300],
         "area": 90000.0, "iscrowd": 1},
        {"image_id": 1, "category_id": 0, "bbox": [400, 400, 460, 460],
         "area": 3600.0, "iscrowd": 0},
    ]
    dt = [  # five dets inside the crowd, interleaved in score with the hit
        {"image_id": 1, "category_id": 0,
         "bbox": [10 + 50 * i, 10 + 50 * i, 40 + 50 * i, 40 + 50 * i],
         "area": 900.0, "score": 0.9 - 0.1 * i}
        for i in range(5)
    ] + [
        {"image_id": 1, "category_id": 0, "bbox": [400, 400, 460, 460],
         "area": 3600.0, "score": 0.5},
    ]
    ours = _assert_tables_match(gt, dt)
    # all crowd-matched dets ignored, the real gt matched: perfect AP
    _, mean_ap = ours.summarize(ap=True)
    assert mean_ap == pytest.approx(1.0)


def test_area_range_boundary_values():
    """Areas exactly at the 32^2 / 96^2 range edges: the ignore predicate
    is `area < lo or area > hi`, so 1024 is NOT ignored in either [0,1024]
    or [1024,9216] — it counts in BOTH small and medium. Pin the inclusive
    boundary (and one ulp either side) against the oracle."""
    areas = [
        1024.0, np.nextafter(1024.0, 0.0), np.nextafter(1024.0, np.inf),
        9216.0, np.nextafter(9216.0, 0.0), np.nextafter(9216.0, np.inf),
    ]
    gt, dt = [], []
    for i, area in enumerate(areas):
        side = float(np.sqrt(area))
        x0 = 50.0 + 120.0 * i
        box = [x0, 50.0, x0 + side, 50.0 + side]
        # stored area is the exact boundary value (dataset-provided areas
        # are authoritative, not recomputed from the box)
        gt.append({"image_id": 1, "category_id": 0, "bbox": box,
                   "area": area, "iscrowd": 0})
        dt.append({"image_id": 1, "category_id": 0, "bbox": list(box),
                   "area": area, "score": 0.9 - 0.01 * i})
    ours = _assert_tables_match(gt, dt)
    # the exact-1024 gt is live in both the small and medium regimes
    prec = ours.eval["precision"]
    assert np.any(prec[:, :, 0, 1, 2] > -1), "small-range slot empty"
    assert np.any(prec[:, :, 0, 2, 2] > -1), "medium-range slot empty"


def test_all_scores_tied_mergesort_order():
    """Every score identical: ranking must be the stable (mergesort)
    original-insertion order, both within an image and in the global
    accumulate concatenation."""
    rng = np.random.RandomState(3)
    gt, dt = [], []
    for img in (1, 2, 3):
        for gi in range(3):
            box = _rand_box(rng, big=True)
            gt.append({"image_id": img, "category_id": 0, "bbox": box,
                       "area": (box[2] - box[0]) * (box[3] - box[1]),
                       "iscrowd": 0})
        for di in range(8):
            src = gt[-(di % 3) - 1]["bbox"]
            jit = rng.uniform(-10, 10, 4)
            box = [src[0] + jit[0], src[1] + jit[1],
                   max(src[0] + jit[0] + 2, src[2] + jit[2]),
                   max(src[1] + jit[1] + 2, src[3] + jit[3])]
            dt.append({"image_id": img, "category_id": 0, "bbox": box,
                       "area": (box[2] - box[0]) * (box[3] - box[1]),
                       "score": 0.5})
    _assert_tables_match(gt, dt)


def test_maxdet_prefix_slicing():
    """maxDets=1/10 must slice the per-image TOP-scored prefix: flood an
    image with high-IoU detections where the single best-scoring one is a
    small-IoU near-miss, so maxDets=1 and maxDets=100 disagree and any
    wrong slicing (tail instead of head, global instead of per-image)
    shifts the tables."""
    gt = [{"image_id": 1, "category_id": 0, "bbox": [100, 100, 200, 200],
           "area": 10000.0, "iscrowd": 0}]
    dt = [  # best score = worst box
        {"image_id": 1, "category_id": 0, "bbox": [140, 140, 240, 240],
         "area": 10000.0, "score": 0.95}]
    for i in range(15):
        dt.append({"image_id": 1, "category_id": 0,
                   "bbox": [100 + i * 0.5, 100, 200 + i * 0.5, 200],
                   "area": 10000.0, "score": 0.9 - 0.02 * i})
    ours = _assert_tables_match(gt, dt)
    prec = ours.eval["precision"]
    # at IoU .75: maxDets=1 sees only the near-miss (AP 0), maxDets=100
    # recovers the match
    t75 = 5  # 0.75 in IOU_THRS
    assert prec[t75, :, 0, 0, 0].max() <= 0.0
    # one FP (higher score) then the match: interpolated precision 0.5
    assert prec[t75, :, 0, 0, 2].max() == pytest.approx(0.5)


def test_images_gts_only_and_dts_only():
    """Deterministic split: image 1 has only gts (pure recall misses),
    image 2 only dts (pure FPs), image 3 both. None of the three may be
    dropped from accumulate (evaluateImg returns None only when BOTH are
    empty)."""
    gt = [
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 50, 50],
         "area": 2500.0, "iscrowd": 0},
        {"image_id": 3, "category_id": 0, "bbox": [10, 10, 90, 90],
         "area": 6400.0, "iscrowd": 0},
    ]
    dt = [
        {"image_id": 2, "category_id": 0, "bbox": [0, 0, 50, 50],
         "area": 2500.0, "score": 0.9},
        {"image_id": 3, "category_id": 0, "bbox": [11, 11, 89, 89],
         "area": 6084.0, "score": 0.8},
    ]
    ours = _assert_tables_match(gt, dt)
    # 2 live gts, 1 matched, 1 FP ahead of it: recall@100 = 0.5
    assert ours.eval["recall"][0, 0, 0, 2] == pytest.approx(0.5)


def test_per_class_nan_for_detection_only_category():
    """A category with detections but zero gt anywhere must yield NaN
    per-class AP (npig==0 leaves its precision column -1) and be excluded
    from the mean — pycocotools nanmean semantics — while a gt-only
    category scores 0, not NaN."""
    gt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 60, 60],
           "area": 3600.0, "iscrowd": 0},
          {"image_id": 1, "category_id": 2, "bbox": [200, 200, 260, 260],
           "area": 3600.0, "iscrowd": 0}]
    dt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 60, 60],
           "area": 3600.0, "score": 0.9},
          # category 1 exists only as detections
          {"image_id": 1, "category_id": 1, "bbox": [100, 100, 160, 160],
           "area": 3600.0, "score": 0.8}]
    ours = _assert_tables_match(gt, dt)
    per_class, mean_ap = ours.summarize(ap=True)
    by_cat = dict(zip(ours.cat_ids, per_class))
    assert np.isnan(by_cat[1]), "det-only category must be NaN"
    assert by_cat[0] == pytest.approx(1.0)
    assert by_cat[2] == pytest.approx(0.0), "unmatched gt category scores 0"
    assert mean_ap == pytest.approx(0.5), "NaN class excluded from the mean"


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
