"""Matcher tests: cost matrix against a numpy oracle of the reference
formulas (dino_detector/matching.py:80-98) and end-to-end matching against
scipy's optimum on the same costs."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from dinov2_od_tpu.config import MatcherConfig
from dinov2_od_tpu.ops.matching import (
    PAD_COST,
    hungarian_match,
    matching_cost_matrix,
)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    return np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def _giou_np(b1, b2):
    area1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    area2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    iou = inter / union
    lt_e = np.minimum(b1[:, None, :2], b2[None, :, :2])
    rb_e = np.maximum(b1[:, None, 2:], b2[None, :, 2:])
    wh_e = np.clip(rb_e - lt_e, 0, None)
    enc = wh_e[..., 0] * wh_e[..., 1]
    return iou - (enc - union) / enc


def reference_cost_np(logits, boxes, tgt_ids, tgt_boxes, cfg: MatcherConfig):
    """Numpy oracle of the reference cost (matching.py:80-98)."""
    prob = _sigmoid(logits)
    a, g = cfg.focal_alpha, cfg.focal_gamma
    neg = (1 - a) * (prob**g) * (-np.log(1 - prob + 1e-8))
    pos = a * ((1 - prob) ** g) * (-np.log(prob + 1e-8))
    cost_class = pos[:, tgt_ids] - neg[:, tgt_ids]
    cost_bbox = np.abs(boxes[:, None, :] - tgt_boxes[None, :, :]).sum(-1)
    cost_giou = -_giou_np(_cxcywh_to_xyxy(boxes), _cxcywh_to_xyxy(tgt_boxes))
    return (
        cfg.cost_class * cost_class
        + cfg.cost_bbox * cost_bbox
        + cfg.cost_giou * cost_giou
    )


def _random_instance(rng, q=12, g=5, c=7):
    logits = rng.normal(size=(q, c)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(g,)).astype(np.int32)
    tgt = rng.uniform(0.2, 0.6, size=(g, 4)).astype(np.float32)
    return logits, boxes, labels, tgt


def test_cost_matrix_matches_reference_oracle(rng):
    cfg = MatcherConfig()
    logits, boxes, labels, tgt = _random_instance(rng)
    valid = np.ones((5,), bool)
    ours = np.asarray(
        matching_cost_matrix(
            jnp.asarray(logits),
            jnp.asarray(boxes),
            jnp.asarray(labels),
            jnp.asarray(tgt),
            jnp.asarray(valid),
            cfg,
        )
    )
    oracle = reference_cost_np(logits, boxes, labels, tgt, cfg)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


def test_cost_matrix_pads_invalid_columns(rng):
    cfg = MatcherConfig()
    logits, boxes, labels, tgt = _random_instance(rng, g=6)
    valid = np.array([True, True, False, True, False, False])
    ours = np.asarray(
        matching_cost_matrix(
            jnp.asarray(logits),
            jnp.asarray(boxes),
            jnp.asarray(labels),
            jnp.asarray(tgt),
            jnp.asarray(valid),
            cfg,
        )
    )
    assert (ours[:, ~valid] == PAD_COST).all()


def test_match_total_cost_equals_scipy(rng):
    cfg = MatcherConfig()
    b, q, g, c = 4, 15, 8, 9
    logits = rng.normal(size=(b, q, c)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(b, q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, g)).astype(np.int32)
    tgt = rng.uniform(0.2, 0.6, size=(b, g, 4)).astype(np.float32)
    n_valid = [3, 8, 0, 1]
    valid = np.zeros((b, g), bool)
    for i, nv in enumerate(n_valid):
        valid[i, :nv] = True

    res = hungarian_match(
        jnp.asarray(logits),
        jnp.asarray(boxes),
        jnp.asarray(labels),
        jnp.asarray(tgt),
        jnp.asarray(valid),
        cfg,
    )
    q_of_gt = np.asarray(res.query_of_gt)
    m_valid = np.asarray(res.match_valid)

    for i in range(b):
        nv = n_valid[i]
        assert m_valid[i].sum() == min(nv, q)
        if nv == 0:
            continue
        oracle = reference_cost_np(logits[i], boxes[i], labels[i, :nv], tgt[i, :nv], cfg)
        ri, ci = linear_sum_assignment(oracle)  # rows=queries, cols=gt
        scipy_total = oracle[ri, ci].sum()
        ours_total = sum(
            oracle[q_of_gt[i, j], j] for j in range(nv) if m_valid[i, j]
        )
        np.testing.assert_allclose(ours_total, scipy_total, rtol=1e-4, atol=1e-4)
        # Matched queries are distinct.
        qs = [q_of_gt[i, j] for j in range(nv) if m_valid[i, j]]
        assert len(qs) == len(set(qs))


def test_match_more_gt_than_queries(rng):
    """When an image has more GT than queries, exactly Q get matched,
    optimally (the reference slices C[:num_queries] and lets scipy drop the
    rest; matching.py:102-105)."""
    cfg = MatcherConfig()
    q, g, c = 5, 9, 4
    logits = rng.normal(size=(1, q, c)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(1, q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(1, g)).astype(np.int32)
    tgt = rng.uniform(0.2, 0.6, size=(1, g, 4)).astype(np.float32)
    valid = np.ones((1, g), bool)

    res = hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(tgt), jnp.asarray(valid), cfg,
    )
    m_valid = np.asarray(res.match_valid)[0]
    q_of_gt = np.asarray(res.query_of_gt)[0]
    assert m_valid.sum() == q

    oracle = reference_cost_np(logits[0], boxes[0], labels[0], tgt[0], cfg)
    ri, ci = linear_sum_assignment(oracle)
    ours_total = sum(oracle[q_of_gt[j], j] for j in range(g) if m_valid[j])
    np.testing.assert_allclose(ours_total, oracle[ri, ci].sum(), rtol=1e-4, atol=1e-4)


def test_replicate_batch0_bug_matches_image0_predictions(rng):
    """With replicate_batch0_bug, every image's assignment equals the one
    computed from image 0's predictions against that image's own GTs —
    the reference's C[:num_queries] slice semantics (matching.py:63-102)."""
    cfg = MatcherConfig(replicate_batch0_bug=True)
    b, q, g, c = 4, 12, 6, 7
    logits = rng.normal(size=(b, q, c)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(b, q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, g)).astype(np.int32)
    tgt = rng.uniform(0.2, 0.6, size=(b, g, 4)).astype(np.float32)
    valid = np.ones((b, g), bool)

    res = hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(tgt), jnp.asarray(valid), cfg,
    )
    q_of_gt = np.asarray(res.query_of_gt)

    for i in range(b):
        # Oracle: image-0 predictions vs image-i targets.
        oracle = reference_cost_np(logits[0], boxes[0], labels[i], tgt[i], cfg)
        ri, ci = linear_sum_assignment(oracle)
        scipy_total = oracle[ri, ci].sum()
        ours_total = sum(oracle[q_of_gt[i, j], j] for j in range(g))
        np.testing.assert_allclose(ours_total, scipy_total, rtol=1e-4, atol=1e-4)

    # And with the flag OFF, image 1's match differs from the buggy one
    # (predictions actually matter).
    res_fixed = hungarian_match(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(tgt), jnp.asarray(valid), MatcherConfig(),
    )
    assert not np.array_equal(np.asarray(res_fixed.query_of_gt)[1], q_of_gt[1])
