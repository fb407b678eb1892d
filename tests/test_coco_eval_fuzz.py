"""Third-implementation fuzz of the COCO evaluator (VERDICT r2 item 7).

The production path (evaluation/coco_metrics.py + the C++ kernel) and its
numpy fallback share one author and one protocol reading. This file holds
a deliberately NAIVE third implementation written straight from the
pycocotools COCOeval.evaluateImg/accumulate/summarize semantics
(reference consumes them at dino_detector/utils.py:255-264), sharing no
helpers with the production code: per-(category, area, maxDet) cell it
recomputes IoU with scalar loops, greedy-matches with scalar loops, and
interpolates precision with an explicit threshold scan. Randomized scenes
cover crowds, score/IoU ties, empty categories, area-boundary boxes, and
annotation `area` fields inconsistent with bbox w*h.

Any divergence between the two is a protocol bug in one of them.
"""

import json

import numpy as np
import pytest

from dinov2_od_tpu.evaluation.coco_metrics import CocoEvaluator

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
REC_THRS = [0.01 * i for i in range(101)]
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_single(d, g, crowd):
    """IoU of one xywh pair with scalar math (crowd: union = det area)."""
    dx1, dy1, dx2, dy2 = d[0], d[1], d[0] + d[2], d[1] + d[3]
    gx1, gy1, gx2, gy2 = g[0], g[1], g[0] + g[2], g[1] + g[3]
    iw = min(dx2, gx2) - max(dx1, gx1)
    ih = min(dy2, gy2) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    d_area = d[2] * d[3]
    g_area = g[2] * g[3]
    union = d_area if crowd else d_area + g_area - inter
    if union <= 0:
        return 0.0
    return inter / union


def naive_coco_eval(gt, results):
    """Helper-free COCOeval bbox protocol on parsed GT json + result dicts."""
    img_ids = [im["id"] for im in gt["images"]]
    cat_ids = [c["id"] for c in gt["categories"]]

    gt_by = {}
    for ann in gt["annotations"]:
        if "bbox" in ann:
            gt_by.setdefault((ann["image_id"], ann["category_id"]), []).append(ann)
    dt_by = {}
    for r in results:
        dt_by.setdefault((r["image_id"], r["category_id"]), []).append(r)

    # precision[cell] lists per category, -1 marks absent cells.
    per_cell = {}  # (area, max_det) -> list over cats of [T, R] or None
    per_cell_rec = {}  # (area, max_det) -> list over cats of [T] or None
    for area_key, rng in AREA_RNGS.items():
        for max_det in (1, 10, 100):
            cats_prec = []
            cats_rec = []
            for cat_id in cat_ids:
                # Gather per image in img_ids order.
                all_scores, all_tpfp = [], []  # tpfp entry: [T] in {1:tp,0:fp,-1:ignore}
                num_gt = 0
                seen_any = False
                for img_id in img_ids:
                    gts = gt_by.get((img_id, cat_id), [])
                    dts = dt_by.get((img_id, cat_id), [])
                    if not gts and not dts:
                        continue
                    seen_any = True
                    g_ig = []
                    for a in gts:
                        area = a.get("area", a["bbox"][2] * a["bbox"][3])
                        g_ig.append(
                            bool(a.get("iscrowd", 0))
                            or area < rng[0]
                            or area > rng[1]
                        )
                    num_gt += sum(1 for x in g_ig if not x)
                    # GT sorted: non-ignored first (stable).
                    g_order = sorted(range(len(gts)), key=lambda i: g_ig[i])
                    gts = [gts[i] for i in g_order]
                    g_ig = [g_ig[i] for i in g_order]
                    # DT sorted by score desc (stable), truncated to maxDet.
                    d_order = sorted(
                        range(len(dts)), key=lambda i: -dts[i]["score"]
                    )[:max_det]
                    dts = [dts[i] for i in d_order]

                    gtm = [[0] * len(gts) for _ in IOU_THRS]
                    for ti, thr in enumerate(IOU_THRS):
                        for di, d in enumerate(dts):
                            best = min(thr, 1 - 1e-10)
                            m = -1
                            for gi, g in enumerate(gts):
                                crowd = bool(g.get("iscrowd", 0))
                                if gtm[ti][gi] > 0 and not crowd:
                                    continue
                                if m > -1 and not g_ig[m] and g_ig[gi]:
                                    break
                                iou = _iou_single(d["bbox"], g["bbox"], crowd)
                                if iou < best:
                                    continue
                                best = iou
                                m = gi
                            if m > -1:
                                gtm[ti][m] = di + 1
                            d.setdefault("_m", {})[(area_key, max_det, ti)] = m
                    for di, d in enumerate(dts):
                        flags = []
                        d_area = d["bbox"][2] * d["bbox"][3]
                        out = d_area < rng[0] or d_area > rng[1]
                        for ti in range(len(IOU_THRS)):
                            m = d["_m"][(area_key, max_det, ti)]
                            if m > -1:
                                flags.append(-1 if g_ig[m] else 1)
                            else:
                                flags.append(-1 if out else 0)
                        all_scores.append(d["score"])
                        all_tpfp.append(flags)
                if not seen_any:
                    cats_prec.append(None)  # category absent entirely
                    cats_rec.append(None)
                    continue
                if num_gt == 0:
                    cats_prec.append("nogt")
                    cats_rec.append("nogt")
                    continue
                order = sorted(
                    range(len(all_scores)), key=lambda i: -all_scores[i]
                )
                prec_tbl = []
                rec_row = []
                for ti in range(len(IOU_THRS)):
                    tp = fp = 0
                    rc_list, pr_list = [], []
                    for i in order:
                        f = all_tpfp[i][ti]
                        if f == 1:
                            tp += 1
                        elif f == 0:
                            fp += 1
                        else:
                            continue  # ignored detection: drops out entirely
                        rc_list.append(tp / num_gt)
                        pr_list.append(tp / max(tp + fp, 1e-300))
                    # Envelope from the right.
                    for i in range(len(pr_list) - 2, -1, -1):
                        pr_list[i] = max(pr_list[i], pr_list[i + 1])
                    q = []
                    for r_thr in REC_THRS:
                        # First index with recall >= threshold.
                        idx = next(
                            (i for i, r in enumerate(rc_list) if r >= r_thr), None
                        )
                        q.append(pr_list[idx] if idx is not None else 0.0)
                    prec_tbl.append(q)
                    # Final recall at this threshold: tp_total / num_gt
                    # (0.0 when every detection was ignored or absent —
                    # matches accumulate()'s `rc[:, -1] if nd else 0`).
                    rec_row.append(rc_list[-1] if rc_list else 0.0)
                cats_prec.append(prec_tbl)
                cats_rec.append(rec_row)
            per_cell[(area_key, max_det)] = cats_prec
            per_cell_rec[(area_key, max_det)] = cats_rec

    def mean_ap(area_key, ti_sel=None):
        vals = []
        for prec in per_cell[(area_key, 100)]:
            if prec is None or prec == "nogt":
                continue
            for ti, row in enumerate(prec):
                if ti_sel is not None and ti != ti_sel:
                    continue
                vals.extend(row)
        vals = [v for v in vals if v > -1]
        return float(np.mean(vals)) if vals else -1.0

    def mean_ar(area_key, max_det):
        vals = []
        for rec in per_cell_rec[(area_key, max_det)]:
            if rec is None or rec == "nogt":
                continue
            vals.extend(rec)
        vals = [v for v in vals if v > -1]
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": mean_ap("all"),
        "AP50": mean_ap("all", 0),
        "AP75": mean_ap("all", 5),
        "APs": mean_ap("small"),
        "APm": mean_ap("medium"),
        "APl": mean_ap("large"),
        "AR1": mean_ar("all", 1),
        "AR10": mean_ar("all", 10),
        "AR100": mean_ar("all", 100),
        "ARs": mean_ar("small", 100),
        "ARm": mean_ar("medium", 100),
        "ARl": mean_ar("large", 100),
    }


def _random_scene(rng, n_imgs=6, n_cats=4):
    """Randomized COCO GT + detections exercising the protocol's edges."""
    cat_ids = [int(c) for c in rng.choice(np.arange(1, 40), n_cats, replace=False)]
    gt = {
        "images": [{"id": i + 1, "width": 640, "height": 480}
                   for i in range(n_imgs)],
        "categories": [{"id": c, "name": f"c{c}"} for c in cat_ids],
        "annotations": [],
    }
    ann_id = 1
    results = []
    for img in gt["images"]:
        for cat in cat_ids:
            if rng.random() < 0.2:
                continue  # empty (img, cat) cell
            for _ in range(int(rng.integers(0, 4))):
                # Quantized geometry to force IoU and area ties; sizes
                # straddling the 32^2 / 96^2 boundaries.
                w = float(rng.choice([8, 16, 31, 32, 33, 64, 96, 97, 128]))
                h = float(rng.choice([8, 16, 32, 32, 64, 96, 96, 128]))
                x = float(rng.integers(0, 8) * 32)
                y = float(rng.integers(0, 8) * 32)
                area = w * h
                if rng.random() < 0.15:
                    # area field inconsistent with bbox wh (segmentation
                    # area) — the protocol trusts the field.
                    area = area * float(rng.choice([0.5, 1.5]))
                gt["annotations"].append({
                    "id": ann_id, "image_id": img["id"], "category_id": cat,
                    "bbox": [x, y, w, h], "area": area,
                    "iscrowd": int(rng.random() < 0.15),
                })
                ann_id += 1
            for _ in range(int(rng.integers(0, 6))):
                w = float(rng.choice([8, 16, 32, 33, 64, 96, 128]))
                h = float(rng.choice([8, 16, 32, 64, 96, 128]))
                x = float(rng.integers(0, 8) * 32 + rng.choice([0, 2, 8]))
                y = float(rng.integers(0, 8) * 32 + rng.choice([0, 2, 8]))
                results.append({
                    "image_id": img["id"], "category_id": cat,
                    "bbox": [x, y, w, h],
                    # Quantized scores to force cross-image ties.
                    "score": float(rng.integers(1, 11)) / 10.0,
                })
    return gt, results


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_production_vs_naive(seed, tmp_path):
    rng = np.random.default_rng(seed)
    gt, results = _random_scene(rng)
    ann_file = tmp_path / "gt.json"
    ann_file.write_text(json.dumps(gt))

    prod = CocoEvaluator(str(ann_file)).evaluate(results)
    naive = naive_coco_eval(gt, results)
    for k in prod:
        assert prod[k] == pytest.approx(naive[k], abs=1e-9), (
            f"seed {seed}: {k} production={prod[k]} naive={naive[k]}"
        )


def test_fuzz_numpy_fallback_vs_naive(tmp_path, monkeypatch):
    """Same comparison with the C++ kernel disabled, so all three
    implementations (C++, numpy fallback, naive) are pinned together."""
    import dinov2_od_tpu.evaluation.native as native

    monkeypatch.setattr(native, "get_lib", lambda: None)
    rng = np.random.default_rng(99)
    gt, results = _random_scene(rng)
    ann_file = tmp_path / "gt.json"
    ann_file.write_text(json.dumps(gt))
    prod = CocoEvaluator(str(ann_file)).evaluate(results)
    naive = naive_coco_eval(gt, results)
    for k in prod:
        assert prod[k] == pytest.approx(naive[k], abs=1e-9)
