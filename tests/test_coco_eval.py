"""COCO mAP evaluator tests: hand-computed AP values for the COCOeval
protocol, matching pycocotools semantics (the reference's metric source,
dino_detector/utils.py:243-276)."""

import json

import numpy as np
import pytest

from dinov2_od_tpu.evaluation.coco_metrics import (
    CocoEvaluator,
    bbox_iou_xywh,
    compute_coco_metrics,
)


def _write_gt(tmp_path, annotations, images=None, categories=None):
    images = images or [{"id": 1, "width": 640, "height": 480}]
    categories = categories or [{"id": 7, "name": "thing"}]
    gt = {"images": images, "annotations": annotations, "categories": categories}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(gt))
    return str(p)


def _ann(ann_id, img_id, cat_id, bbox, iscrowd=0):
    return {
        "id": ann_id, "image_id": img_id, "category_id": cat_id,
        "bbox": bbox, "area": bbox[2] * bbox[3], "iscrowd": iscrowd,
    }


def _det(img_id, cat_id, bbox, score):
    return {"image_id": img_id, "category_id": cat_id, "bbox": bbox, "score": score}


def test_iou_xywh():
    dt = np.array([[0.0, 0.0, 10, 6]])
    gt = np.array([[0.0, 0.0, 10, 10]])
    iou = bbox_iou_xywh(dt, gt, np.array([0]))
    np.testing.assert_allclose(iou, [[0.6]])
    # Crowd: union = dt area.
    iou_c = bbox_iou_xywh(dt, gt, np.array([1]))
    np.testing.assert_allclose(iou_c, [[1.0]])  # inter 60 / dt area 60


def test_perfect_detection_ap_one(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    res = [_det(1, 7, [100, 100, 50, 50], 0.9)]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 1.0 and m["AP50"] == 1.0 and m["AP75"] == 1.0
    # 50x50 box -> medium area (32^2 < 2500 < 96^2).
    assert m["APm"] == 1.0
    assert m["APs"] == -1.0 and m["APl"] == -1.0


def test_no_detections_ap_zero(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    m = compute_coco_metrics([], gt_file)
    assert m["AP"] == 0.0


def test_tp_then_fp_ap_one(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    res = [
        _det(1, 7, [100, 100, 50, 50], 0.9),   # TP
        _det(1, 7, [300, 300, 50, 50], 0.8),   # FP after it
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 1.0  # 101-pt interpolation: precision 1.0 at all recalls


def test_fp_then_tp_ap_half(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    res = [
        _det(1, 7, [300, 300, 50, 50], 0.9),   # FP ranked first
        _det(1, 7, [100, 100, 50, 50], 0.8),   # TP second
    ]
    m = compute_coco_metrics(res, gt_file)
    np.testing.assert_allclose(m["AP"], 0.5)
    np.testing.assert_allclose(m["AP50"], 0.5)


def test_partial_iou_counts_at_low_thresholds_only(tmp_path):
    # IoU exactly 0.6: TP at thresholds .5, .55, .6 -> AP = 3/10.
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [0, 0, 10, 10])])
    res = [_det(1, 7, [0, 0, 10, 6], 0.9)]
    m = compute_coco_metrics(res, gt_file)
    np.testing.assert_allclose(m["AP"], 0.3, atol=1e-9)
    assert m["AP50"] == 1.0
    assert m["AP75"] == 0.0


def test_crowd_gt_ignored_not_fp(tmp_path):
    gt_file = _write_gt(
        tmp_path,
        [
            _ann(1, 1, 7, [100, 100, 50, 50]),             # real gt
            _ann(2, 1, 7, [300, 300, 100, 100], iscrowd=1) # crowd region
        ],
    )
    res = [
        _det(1, 7, [100, 100, 50, 50], 0.9),    # TP
        _det(1, 7, [300, 300, 90, 90], 0.8),    # inside crowd -> ignored
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 1.0  # crowd hit neither TP nor FP


def test_wrong_category_is_fp(tmp_path):
    gt_file = _write_gt(
        tmp_path,
        [_ann(1, 1, 7, [100, 100, 50, 50])],
        categories=[{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
    )
    res = [_det(1, 9, [100, 100, 50, 50], 0.9)]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 0.0


def test_duplicate_detections_second_is_fp(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    res = [
        _det(1, 7, [100, 100, 50, 50], 0.9),
        _det(1, 7, [101, 101, 50, 50], 0.8),  # duplicate: gt already matched
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 1.0  # recall already 1.0 at the TP; dup lowers nothing


def test_two_images_two_categories(tmp_path):
    gt_file = _write_gt(
        tmp_path,
        [
            _ann(1, 1, 7, [10, 10, 50, 50]),
            _ann(2, 2, 9, [20, 20, 40, 40]),
        ],
        images=[{"id": 1}, {"id": 2}],
        categories=[{"id": 7, "name": "a"}, {"id": 9, "name": "b"}],
    )
    # cat 7 perfectly detected; cat 9 missed -> AP = mean(1.0, 0.0) = 0.5.
    res = [_det(1, 7, [10, 10, 50, 50], 0.9)]
    m = compute_coco_metrics(res, gt_file)
    np.testing.assert_allclose(m["AP"], 0.5)


def test_maxdets_limit(tmp_path):
    # 1 gt; 100 high-scoring FPs ahead of the TP. With maxDets=100 the TP
    # (rank 101) is dropped -> AP contribution via maxDet=100 column is 0.
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [100, 100, 50, 50])])
    res = [
        _det(1, 7, [300 + i, 300, 10, 10], 0.99 - i * 0.001)
        for i in range(100)
    ] + [_det(1, 7, [100, 100, 50, 50], 0.5)]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == 0.0


def test_end_to_end_synthetic_dataset(tmp_path):
    """Write a synthetic COCO dataset, feed its own GT as detections ->
    AP must be 1.0 everywhere a GT exists."""
    from dinov2_od_tpu.data.synthetic import write_coco_dataset

    _, ann_file = write_coco_dataset(str(tmp_path), num_images=6, seed=3)
    with open(ann_file) as f:
        gt = json.load(f)
    res = [
        _det(a["image_id"], a["category_id"], a["bbox"], 0.95)
        for a in gt["annotations"]
    ]
    m = compute_coco_metrics(res, ann_file)
    assert m["AP"] == 1.0 and m["AP50"] == 1.0


# ---------------------------------------------------------------------------
# Adversarial protocol cases (VERDICT r1: hardening in lieu of pycocotools
# cross-check — no egress, so these encode the protocol subtleties by hand).
# ---------------------------------------------------------------------------

def test_score_ties_stable_order(tmp_path):
    """Equal-score detections keep insertion order (mergesort stability):
    the TP listed first is cumulated before the FP, AP stays 1.0."""
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [10, 10, 20, 20])])
    res = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.5},
        {"image_id": 1, "category_id": 7, "bbox": [400, 400, 20, 20], "score": 0.5},
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP50"] == pytest.approx(1.0)
    # Flipped insertion order: FP first at the same score halves AP50
    # (precision at the single recall point is 0.5).
    m2 = compute_coco_metrics(list(reversed(res)), gt_file)
    assert m2["AP50"] == pytest.approx(0.5)


def test_area_boundary_exactly_32sq(tmp_path):
    """GT with area exactly 32^2 = 1024 belongs to BOTH small (<=1024) and
    medium (>=1024) ranges (pycocotools ranges are inclusive)."""
    bbox = [10, 10, 32, 32]
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, bbox)])
    res = [{"image_id": 1, "category_id": 7, "bbox": bbox, "score": 0.9}]
    m = compute_coco_metrics(res, gt_file)
    assert m["APs"] == pytest.approx(1.0)
    assert m["APm"] == pytest.approx(1.0)
    assert m["APl"] == -1.0  # no large GT -> undefined cell


def test_crowd_absorbs_multiple_detections(tmp_path):
    """Several detections may all match one crowd GT (gtm not exclusive for
    crowds) and are all ignored, not FPs."""
    gt_file = _write_gt(tmp_path, [
        _ann(1, 1, 7, [10, 10, 100, 100], iscrowd=1),
        _ann(2, 1, 7, [300, 300, 20, 20]),
    ])
    res = [
        {"image_id": 1, "category_id": 7, "bbox": [300, 300, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 7, "bbox": [12, 12, 50, 50], "score": 0.8},
        {"image_id": 1, "category_id": 7, "bbox": [40, 40, 60, 60], "score": 0.7},
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP50"] == pytest.approx(1.0)


def test_out_of_area_unmatched_detection_not_fp(tmp_path):
    """An unmatched detection whose area lies outside the cell's range is
    ignored there, so it cannot depress the small/medium/large APs."""
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [10, 10, 20, 20])])  # small
    res = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.9},
        # Unmatched LARGE detection: FP for 'all', ignored for 'small'.
        {"image_id": 1, "category_id": 7, "bbox": [300, 10, 150, 150], "score": 0.95},
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["APs"] == pytest.approx(1.0)
    assert m["AP50"] == pytest.approx(0.5)  # 'all' sees the FP ranked first


def test_maxdet_truncation_is_per_image(tmp_path):
    """maxDets truncates per image BEFORE cross-image score sorting: a
    flood of low-score detections in image 1 cannot evict image 2's."""
    gt_file = _write_gt(
        tmp_path,
        [_ann(1, 1, 7, [10, 10, 20, 20]), _ann(2, 2, 7, [10, 10, 20, 20])],
        images=[{"id": 1}, {"id": 2}],
    )
    res = [{"image_id": 2, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.05}]
    # 150 junk detections in image 1, all scored above image 2's TP.
    for k in range(150):
        res.append({
            "image_id": 1, "category_id": 7,
            "bbox": [400, 400, 5, 5], "score": 0.9 - k * 0.001,
        })
    res.append({"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.99})
    m = compute_coco_metrics(res, gt_file)
    # Both TPs survive truncation (img1 keeps its 0.99 TP + 99 junk, img2
    # keeps its only detection) -> recall 1.0 at IoU .5.
    ev = CocoEvaluator(gt_file)
    ev.evaluate(res)
    assert ev.recall[0, 0, 0, 2] == pytest.approx(1.0)  # thr=.5, all, maxDet=100


def test_detection_for_unknown_category_ignored(tmp_path):
    gt_file = _write_gt(tmp_path, [_ann(1, 1, 7, [10, 10, 20, 20])])
    res = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 99, "bbox": [10, 10, 20, 20], "score": 0.9},
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["AP"] == pytest.approx(1.0)


def test_gt_sort_puts_ignored_last_but_matchable(tmp_path):
    """A detection overlapping only an area-ignored GT matches it and is
    ignored (not an FP), while non-ignored GT keep matching priority."""
    gt_file = _write_gt(tmp_path, [
        _ann(1, 1, 7, [10, 10, 200, 200]),   # large GT
        _ann(2, 1, 7, [500, 10, 20, 20]),    # small GT
    ])
    # One detection on each; in the 'small' cell the large GT is ignored.
    res = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 200, 200], "score": 0.9},
        {"image_id": 1, "category_id": 7, "bbox": [500, 10, 20, 20], "score": 0.8},
    ]
    m = compute_coco_metrics(res, gt_file)
    assert m["APs"] == pytest.approx(1.0)
    assert m["APl"] == pytest.approx(1.0)
    assert m["AP"] == pytest.approx(1.0)


def test_evaluate_arrays_matches_evaluate(tmp_path):
    """The array-native entry point (evaluate_arrays) reproduces
    evaluate()'s 12 stats exactly on a randomized scene."""
    import json

    from test_coco_eval_fuzz import _random_scene

    rng = np.random.default_rng(123)
    gt, results = _random_scene(rng)
    ann = tmp_path / "gt.json"
    ann.write_text(json.dumps(gt))

    want = CocoEvaluator(str(ann)).evaluate(results)
    ids = np.asarray([r["image_id"] for r in results])
    cats = np.asarray([r["category_id"] for r in results])
    boxes = np.asarray([r["bbox"] for r in results]).reshape(-1, 4)
    scores = np.asarray([r["score"] for r in results])
    got = CocoEvaluator(str(ann)).evaluate_arrays(ids, cats, boxes, scores)
    assert got == want
    # Empty detections: same handling.
    empty = CocoEvaluator(str(ann)).evaluate_arrays(
        np.zeros(0, np.int64), np.zeros(0, np.int64),
        np.zeros((0, 4)), np.zeros(0),
    )
    assert empty == CocoEvaluator(str(ann)).evaluate([])
