"""Benchmark CocoEvaluator at COCO val5k scale (synthetic predictions).

VERDICT r1 #3: full 5k-image x 80-class evaluation must complete in well
under a minute of host time. Run:  python tools/bench_evaluator.py
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dinov2_od_tpu.evaluation.coco_metrics import CocoEvaluator  # noqa: E402


def synth(n_img=5000, n_cat=80, anns_per_img=7, dets_per_img=100, seed=0):
    rng = np.random.default_rng(seed)
    images = [{"id": i} for i in range(n_img)]
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cat)]
    anns, dets = [], []
    aid = 0
    for i in range(n_img):
        n_gt = rng.poisson(anns_per_img)
        gt_boxes = []
        for _ in range(n_gt):
            x, y = rng.uniform(0, 500, 2)
            w, h = rng.uniform(4, 140, 2)
            c = int(rng.integers(1, n_cat + 1))
            aid += 1
            anns.append({
                "id": aid, "image_id": i, "category_id": c,
                "bbox": [x, y, w, h], "area": w * h,
                "iscrowd": int(rng.random() < 0.02),
            })
            gt_boxes.append((x, y, w, h, c))
        # Detections: 60% jittered GT (TP-ish), rest random (FP).
        for d in range(dets_per_img):
            if gt_boxes and rng.random() < 0.6:
                x, y, w, h, c = gt_boxes[int(rng.integers(len(gt_boxes)))]
                j = rng.normal(0, 6, 4)
                bbox = [x + j[0], y + j[1], max(2, w + j[2]), max(2, h + j[3])]
            else:
                x, y = rng.uniform(0, 500, 2)
                w, h = rng.uniform(4, 140, 2)
                c = int(rng.integers(1, n_cat + 1))
                bbox = [x, y, w, h]
            dets.append({
                "image_id": i, "category_id": int(c),
                "bbox": [float(b) for b in bbox],
                "score": float(rng.random()),
            })
    return {"images": images, "annotations": anns, "categories": cats}, dets


def main():
    gt, dets = synth()
    print(f"synthetic: {len(gt['images'])} imgs, {len(gt['annotations'])} GT, "
          f"{len(dets)} detections")
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(gt, f)
        path = f.name
    try:
        t0 = time.time()
        ev = CocoEvaluator(path)
        t1 = time.time()
        metrics = ev.evaluate(dets)
        t2 = time.time()
        print(f"init (JSON parse + GT prep): {t1 - t0:.2f}s")
        print(f"evaluate:                    {t2 - t1:.2f}s")
        print(metrics)
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
