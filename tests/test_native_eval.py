"""C++ COCO-eval kernel vs the numpy reference path: identical outputs on
randomized cells and identical final metrics end-to-end."""

import numpy as np
import pytest

from dinov2_od_tpu.evaluation.coco_metrics import (
    IOU_THRS,
    _match_image_category,
)
from dinov2_od_tpu.evaluation.native import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native coco_eval lib not built (no g++?)"
)


def _random_cell(rng, n_dt, n_gt):
    dt_boxes = np.concatenate(
        [rng.uniform(0, 200, (n_dt, 2)), rng.uniform(5, 80, (n_dt, 2))], axis=1
    )
    dt_scores = rng.uniform(0, 1, n_dt)
    gt_boxes = np.concatenate(
        [rng.uniform(0, 200, (n_gt, 2)), rng.uniform(5, 80, (n_gt, 2))], axis=1
    )
    gt_ignore = (rng.uniform(size=n_gt) < 0.2).astype(np.int64)
    gt_crowd = (rng.uniform(size=n_gt) < 0.15).astype(np.int64)
    # Crowd implies ignore in the protocol (crowd -> _ignore=1).
    gt_ignore = np.maximum(gt_ignore, gt_crowd)
    return dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_crowd


@pytest.mark.parametrize("n_dt,n_gt", [(0, 3), (5, 0), (8, 5), (40, 20), (120, 60)])
def test_native_matches_numpy_cell(rng, n_dt, n_gt):
    dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_crowd = _random_cell(rng, n_dt, n_gt)
    for area_rng in [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2)]:
        for max_det in (1, 10, 100):
            a = _match_image_category(
                dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_crowd,
                area_rng, max_det, use_native=False,
            )
            b = _match_image_category(
                dt_boxes, dt_scores, gt_boxes, gt_ignore, gt_crowd,
                area_rng, max_det, use_native=True,
            )
            np.testing.assert_array_equal(a["dtm"], b["dtm"])
            np.testing.assert_array_equal(a["dt_ignore"], b["dt_ignore"])
            np.testing.assert_array_equal(a["dt_scores"], b["dt_scores"])
            assert a["num_gt"] == b["num_gt"]


def test_native_end_to_end_identical_metrics(tmp_path, rng):
    """Full evaluation with and without the native kernel must agree."""
    import json

    from dinov2_od_tpu.evaluation import coco_metrics as cm

    images = [{"id": i} for i in range(1, 6)]
    cats = [{"id": 3, "name": "a"}, {"id": 8, "name": "b"}]
    anns, dets = [], []
    ann_id = 1
    for img in images:
        for cat in cats:
            n = int(rng.integers(0, 4))
            for _ in range(n):
                box = [float(rng.uniform(0, 200)), float(rng.uniform(0, 200)),
                       float(rng.uniform(10, 60)), float(rng.uniform(10, 60))]
                anns.append({
                    "id": ann_id, "image_id": img["id"], "category_id": cat["id"],
                    "bbox": box, "area": box[2] * box[3],
                    "iscrowd": int(rng.uniform() < 0.1),
                })
                ann_id += 1
                if rng.uniform() < 0.7:  # noisy detection of this gt
                    jitter = rng.normal(0, 4, 4)
                    dets.append({
                        "image_id": img["id"], "category_id": cat["id"],
                        "bbox": [box[i] + float(jitter[i]) for i in range(4)],
                        "score": float(rng.uniform(0.3, 1.0)),
                    })
            if rng.uniform() < 0.5:  # random FP
                dets.append({
                    "image_id": img["id"], "category_id": cat["id"],
                    "bbox": [float(rng.uniform(0, 200)), float(rng.uniform(0, 200)),
                             20.0, 20.0],
                    "score": float(rng.uniform(0, 1)),
                })

    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps(
        {"images": images, "annotations": anns, "categories": cats}
    ))

    ev = cm.CocoEvaluator(str(gt_file))
    with_native = ev.evaluate(dets)

    # Force the numpy path by monkeypatching availability.
    import dinov2_od_tpu.evaluation.native as native_mod

    orig = native_mod.get_lib
    native_mod.get_lib = lambda: None
    try:
        ev2 = cm.CocoEvaluator(str(gt_file))
        without_native = ev2.evaluate(dets)
    finally:
        native_mod.get_lib = orig

    assert with_native == without_native


def test_native_matches_numpy_randomized_large(tmp_path, rng):
    """Randomized differential check at moderate scale: crowds, empty
    images, score ties, detections in GT-less categories, >100 dets/img.
    The batched C++ category kernel and the pure numpy path must produce
    bit-identical metrics."""
    import json

    from dinov2_od_tpu.evaluation import coco_metrics as cm
    import dinov2_od_tpu.evaluation.native as native_mod

    if native_mod.get_lib() is None:
        pytest.skip("native kernel unavailable")

    n_img, cats = 40, [1, 2, 3]
    images = [{"id": i} for i in range(n_img)]
    anns, dets, aid = [], [], 0
    for i in range(n_img):
        for _ in range(int(rng.integers(0, 9))):  # some images empty
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(2, 150, 2)
            aid += 1
            anns.append({
                "id": aid, "image_id": i,
                "category_id": int(rng.choice(cats)),
                "bbox": [x, y, w, h], "area": float(w * h),
                "iscrowd": int(rng.random() < 0.15),
            })
        n_det = int(rng.integers(0, 130))
        for d in range(n_det):
            x, y = rng.uniform(0, 400, 2)
            w, h = rng.uniform(2, 150, 2)
            dets.append({
                "image_id": i, "category_id": int(rng.choice(cats + [9])),
                "bbox": [float(x), float(y), float(w), float(h)],
                # Quantized scores -> plenty of exact ties.
                "score": float(np.round(rng.random(), 2)),
            })

    gt_file = tmp_path / "gt.json"
    gt_file.write_text(json.dumps({
        "images": images, "annotations": anns,
        "categories": [{"id": c, "name": str(c)} for c in cats],
    }))

    ev_native = cm.CocoEvaluator(str(gt_file))
    m_native = ev_native.evaluate(dets)

    orig = native_mod.get_lib
    native_mod.get_lib = lambda: None
    try:
        ev_np = cm.CocoEvaluator(str(gt_file))
        m_np = ev_np.evaluate(dets)
    finally:
        native_mod.get_lib = orig

    assert m_native == m_np
    np.testing.assert_array_equal(ev_native.precision, ev_np.precision)
    np.testing.assert_array_equal(ev_native.recall, ev_np.recall)
