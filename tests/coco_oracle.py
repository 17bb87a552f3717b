"""Test-only COCOeval oracle: a deliberately naive, loop-based
transliteration of the published pycocotools ``cocoeval.py`` algorithm
(bbox mode), used to cross-validate the production vectorized/native
implementation in ``centernet_uda_tpu.evaluation.coco_eval_np``.

pycocotools itself is not installable in this image (no network egress),
so golden files from the real library cannot be generated here; this
oracle is an *independent implementation path* — per-detection Python
loops, pycocotools variable naming and control flow — whereas the
production code is vectorized numpy plus a native C++ greedy matcher.
Agreement across randomized scenarios (crowds, area ranges, score ties,
>100 detections, empty images) is the strongest cross-check available
in-image. Protocol source: pycocotools cocoeval (COCO api), as driven by
the reference at /root/reference/evaluation/coco.py:114-188.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(
    0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True
)
REC_THRS = np.linspace(
    0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1, endpoint=True
)
MAX_DETS = (1, 10, 100)
AREA_RNG = (
    (0.0, 1e10),
    (0.0, 32.0 ** 2),
    (32.0 ** 2, 96.0 ** 2),
    (96.0 ** 2, 1e10),
)


def _iou_single(d, g, crowd):
    """IoU of one x1y1x2y2 det box with one gt box; crowd gt uses
    intersection over detection area (maskUtils.iou iscrowd semantics)."""
    ix1, iy1 = max(d[0], g[0]), max(d[1], g[1])
    ix2, iy2 = min(d[2], g[2]), min(d[3], g[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    darea = (d[2] - d[0]) * (d[3] - d[1])
    garea = (g[2] - g[0]) * (g[3] - g[1])
    union = darea if crowd else darea + garea - inter
    return inter / union if union > 0 else 0.0


class OracleEval:
    """Evaluate + accumulate exactly like pycocotools.cocoeval.COCOeval."""

    def __init__(self, gt_annos, dt_annos):
        self.gts = {}
        self.dts = {}
        img_ids, cat_ids = set(), set()
        for g in gt_annos:
            self.gts.setdefault((g["image_id"], g["category_id"]), []).append(g)
            img_ids.add(g["image_id"])
            cat_ids.add(g["category_id"])
        for d in dt_annos:
            self.dts.setdefault((d["image_id"], d["category_id"]), []).append(d)
            img_ids.add(d["image_id"])
            cat_ids.add(d["category_id"])
        self.img_ids = sorted(img_ids)
        self.cat_ids = sorted(cat_ids)

    # -- cocoeval.evaluateImg ------------------------------------------
    def evaluate_img(self, img_id, cat_id, a_rng, max_det):
        gt = list(self.gts.get((img_id, cat_id), []))
        dt = list(self.dts.get((img_id, cat_id), []))
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            g["_ignore"] = int(
                bool(g.get("iscrowd", 0))
                or g["area"] < a_rng[0]
                or g["area"] > a_rng[1]
            )
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[0:max_det]]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]

        T = len(IOU_THRS)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore"] for g in gt])
        dt_ig = np.zeros((T, D))
        if D and G:
            ious = np.array(
                [[_iou_single(d["bbox"], g["bbox"], iscrowd[gi])
                  for gi, g in enumerate(gt)] for d in dt]
            )
            for tind, t in enumerate(IOU_THRS):
                for dind in range(D):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = 1
                    gtm[tind, m] = 1
        a = np.array(
            [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]
        ).reshape((1, D))
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtScores": [d["score"] for d in dt],
            "dtMatches": dtm,
            "dtIgnore": dt_ig,
            "gtIgnore": gt_ig,
        }

    # -- cocoeval.accumulate -------------------------------------------
    def accumulate(self):
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))

        for k, cat_id in enumerate(self.cat_ids):
            for a, a_rng in enumerate(AREA_RNG):
                for m, max_det in enumerate(MAX_DETS):
                    E = [
                        self.evaluate_img(img_id, cat_id, a_rng, max_det)
                        for img_id in self.img_ids
                    ]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dt_scores = np.concatenate(
                        [e["dtScores"][0:max_det] for e in E]
                    )
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gt_ig == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(
                        np.logical_not(dtm), np.logical_not(dt_ig)
                    )
                    tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                    fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(inds_r):
                                q[ri] = pr[pi]
                        except IndexError:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        return {"precision": precision, "recall": recall}
