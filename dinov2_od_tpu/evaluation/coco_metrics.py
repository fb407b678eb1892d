"""COCO mAP evaluation (bbox protocol), dependency-free.

The reference computes metrics through the pycocotools C extension
(dino_detector/utils.py:243-276: COCO / COCOeval / evaluate / accumulate /
summarize). That library is not available here, so this module implements
the exact COCOeval bbox protocol in vectorized numpy:

- IoU thresholds 0.50:0.05:0.95, recall thresholds 0:0.01:1.00;
- area ranges all / small(<32^2) / medium / large; maxDets 1/10/100;
- greedy per-detection matching in score order, crowd GT as ignore
  regions with IoU computed against the detection area;
- precision envelope + 101-point interpolation; AP = mean over
  non-negative precisions; stats[0..5] = AP, AP50, AP75, APs, APm, APl.

A C++ accelerated path for the IoU+matching inner loop is provided by
native/coco_eval (used automatically when built); this numpy path is the
reference implementation and the fallback.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
AREA_KEYS = list(AREA_RNG)
MAX_DETS = (1, 10, 100)


def bbox_iou_xywh(dt: np.ndarray, gt: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """Pairwise IoU of xywh boxes; crowd GT uses detection area as union
    (pycocotools maskUtils.iou semantics)."""
    if len(dt) == 0 or len(gt) == 0:
        return np.zeros((len(dt), len(gt)))
    dx1, dy1 = dt[:, 0], dt[:, 1]
    dx2, dy2 = dt[:, 0] + dt[:, 2], dt[:, 1] + dt[:, 3]
    gx1, gy1 = gt[:, 0], gt[:, 1]
    gx2, gy2 = gt[:, 0] + gt[:, 2], gt[:, 1] + gt[:, 3]
    iw = np.clip(
        np.minimum(dx2[:, None], gx2[None, :])
        - np.maximum(dx1[:, None], gx1[None, :]),
        0,
        None,
    )
    ih = np.clip(
        np.minimum(dy2[:, None], gy2[None, :])
        - np.maximum(dy1[:, None], gy1[None, :]),
        0,
        None,
    )
    inter = iw * ih
    d_area = (dt[:, 2] * dt[:, 3])[:, None]
    g_area = (gt[:, 2] * gt[:, 3])[None, :]
    union = np.where(iscrowd[None, :], d_area, d_area + g_area - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image_category(
    dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_iscrowd, area_rng, max_det,
    use_native: bool = True,
):
    """pycocotools COCOeval.evaluateImg for one (image, category).

    Returns dict with per-threshold detection matches/ignores and the
    number of non-ignored GT. The O(thr * dt * gt) inner loop dispatches to
    the C++ kernel (native/coco_eval.cc) when built; the numpy/Python loop
    below is the reference implementation and fallback.
    """
    t_count = len(IOU_THRS)
    # GT order: non-ignored first (pycocotools sorts by _ignore).
    g_order = np.argsort(gt_ignore, kind="stable")
    gt_boxes = gt_boxes[g_order]
    gt_ig = gt_ignore[g_order].astype(bool)
    gt_crowd = gt_iscrowd[g_order].astype(bool)

    d_order = np.argsort(-dt_scores, kind="stable")[:max_det]
    dt_boxes_s = dt_boxes[d_order]
    dt_scores_s = dt_scores[d_order]

    if use_native:
        from .native import get_lib, match_cell_native

        if get_lib() is not None:
            dtm, dt_ig = match_cell_native(
                dt_boxes_s, gt_boxes, gt_ig.astype(np.int32),
                gt_crowd.astype(np.int32), IOU_THRS, area_rng,
            )
            return {
                "dt_scores": dt_scores_s,
                "dtm": dtm,
                "dt_ignore": dt_ig,
                "num_gt": int((~gt_ig).sum()),
            }

    ious = bbox_iou_xywh(dt_boxes_s, gt_boxes, gt_crowd)

    n_d, n_g = len(dt_boxes_s), len(gt_boxes)
    dtm = np.zeros((t_count, n_d), dtype=np.int64)  # matched gt index + 1
    gtm = np.zeros((t_count, n_g), dtype=np.int64)
    dt_ig = np.zeros((t_count, n_d), dtype=bool)

    for ti, thr in enumerate(IOU_THRS):
        for di in range(n_d):
            best_iou = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(n_g):
                if gtm[ti, gi] > 0 and not gt_crowd[gi]:
                    continue
                # Non-ignored candidates exhausted once we reach ignored GT
                # while already holding a non-ignored match.
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[di, gi] < best_iou:
                    continue
                best_iou = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dt_ig[ti, di] = gt_ig[m]
            dtm[ti, di] = m + 1
            gtm[ti, m] = di + 1

    # Unmatched detections outside the area range are ignored.
    d_areas = dt_boxes_s[:, 2] * dt_boxes_s[:, 3]
    out_of_rng = (d_areas < area_rng[0]) | (d_areas > area_rng[1])
    dt_ig = dt_ig | ((dtm == 0) & out_of_rng[None, :])

    return {
        "dt_scores": dt_scores_s,
        "dtm": dtm,
        "dt_ignore": dt_ig,
        "num_gt": int((~gt_ig).sum()),
    }


class CocoEvaluator:
    """COCO bbox evaluation against a ground-truth annotation file."""

    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            gt = json.load(f)
        self.cat_ids = [c["id"] for c in gt.get("categories", [])]
        self.img_ids = [im["id"] for im in gt.get("images", [])]
        self._gt_by_img_cat = defaultdict(list)
        for ann in gt.get("annotations", []):
            if "bbox" not in ann:
                continue
            self._gt_by_img_cat[(ann["image_id"], ann["category_id"])].append(ann)

    def evaluate(self, results: Sequence[dict]) -> Dict[str, float]:
        """Run the full protocol on detection result dicts
        ({image_id, category_id, bbox xywh, score})."""
        dt_by_img_cat = defaultdict(list)
        for r in results:
            dt_by_img_cat[(r["image_id"], r["category_id"])].append(r)

        n_cat = len(self.cat_ids)
        n_area = len(AREA_KEYS)
        n_thr = len(IOU_THRS)
        n_rec = len(REC_THRS)
        n_md = len(MAX_DETS)

        precision = -np.ones((n_thr, n_rec, n_cat, n_area, n_md))
        recall = -np.ones((n_thr, n_cat, n_area, n_md))

        for ci, cat_id in enumerate(self.cat_ids):
            for ai, area_key in enumerate(AREA_KEYS):
                rng = AREA_RNG[area_key]
                for mi, max_det in enumerate(MAX_DETS):
                    evals = []
                    for img_id in self.img_ids:
                        gts = self._gt_by_img_cat.get((img_id, cat_id), [])
                        dts = dt_by_img_cat.get((img_id, cat_id), [])
                        if not gts and not dts:
                            continue
                        gt_boxes = np.asarray(
                            [g["bbox"] for g in gts], np.float64
                        ).reshape(-1, 4)
                        gt_crowd = np.asarray(
                            [g.get("iscrowd", 0) for g in gts], np.int64
                        )
                        gt_area = np.asarray(
                            [
                                g.get("area", g["bbox"][2] * g["bbox"][3])
                                for g in gts
                            ],
                            np.float64,
                        )
                        gt_ignore = (
                            (gt_crowd > 0)
                            | (gt_area < rng[0])
                            | (gt_area > rng[1])
                        ).astype(np.int64)
                        dt_boxes = np.asarray(
                            [d["bbox"] for d in dts], np.float64
                        ).reshape(-1, 4)
                        dt_scores = np.asarray(
                            [d["score"] for d in dts], np.float64
                        )
                        evals.append(
                            _match_image_category(
                                dt_boxes, dt_scores, gt_boxes, gt_ignore,
                                gt_crowd, rng, max_det,
                            )
                        )
                    self._accumulate_cell(
                        evals, precision, recall, ci, ai, mi
                    )

        self.precision = precision
        self.recall = recall
        return self.summarize()

    @staticmethod
    def _accumulate_cell(evals, precision, recall, ci, ai, mi):
        """pycocotools COCOeval.accumulate for one (cat, area, maxDet)."""
        if not evals:
            return
        num_gt = sum(e["num_gt"] for e in evals)
        if num_gt == 0:
            return
        dt_scores = np.concatenate([e["dt_scores"] for e in evals])
        order = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtm"] for e in evals], axis=1)[:, order]
        dt_ig = np.concatenate([e["dt_ignore"] for e in evals], axis=1)[:, order]

        tps = (dtm > 0) & ~dt_ig
        fps = (dtm == 0) & ~dt_ig
        tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(np.float64)

        for ti in range(len(IOU_THRS)):
            tp, fp = tp_sum[ti], fp_sum[ti]
            nd = len(tp)
            rc = tp / num_gt
            pr = tp / np.maximum(tp + fp, np.spacing(1))
            recall[ti, ci, ai, mi] = rc[-1] if nd else 0.0

            # Precision envelope (monotone non-increasing from the right).
            q = np.zeros(len(REC_THRS))
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds = np.searchsorted(rc, REC_THRS, side="left")
            for ri, pi in enumerate(inds):
                if pi < nd:
                    q[ri] = pr[pi]
            precision[ti, :, ci, ai, mi] = q

    def _summ(self, ap: bool, iou: Optional[float] = None,
              area: str = "all", max_det: int = 100) -> float:
        ai = AREA_KEYS.index(area)
        mi = MAX_DETS.index(max_det)
        if ap:
            s = self.precision[:, :, :, ai, mi]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
        else:
            s = self.recall[:, :, ai, mi]
            if iou is not None:
                s = s[np.where(np.isclose(IOU_THRS, iou))[0]]
        valid = s[s > -1]
        return float(valid.mean()) if valid.size else -1.0

    def summarize(self) -> Dict[str, float]:
        """The six headline stats the reference extracts
        (utils.py:267-274)."""
        return {
            "AP": self._summ(True),
            "AP50": self._summ(True, iou=0.5),
            "AP75": self._summ(True, iou=0.75),
            "APs": self._summ(True, area="small"),
            "APm": self._summ(True, area="medium"),
            "APl": self._summ(True, area="large"),
        }


def compute_coco_metrics(
    results: Sequence[dict], annotation_file: str
) -> Dict[str, float]:
    """Drop-in equivalent of the reference compute_coco_metrics
    (utils.py:243-276)."""
    return CocoEvaluator(annotation_file).evaluate(results)
