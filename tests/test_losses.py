"""Loss tests against a numpy oracle of the reference SetCriterion
(dino_detector/losses.py:96-241), using scipy matching on unpadded data."""

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from dinov2_od_tpu.config import LossConfig, MatcherConfig
from dinov2_od_tpu.ops.losses import set_criterion, sigmoid_focal_bce

from test_matching import (
    _cxcywh_to_xyxy,
    _giou_np,
    _sigmoid,
    reference_cost_np,
)


def _bce_logits_np(logits, targets):
    return (
        np.maximum(logits, 0)
        - logits * targets
        + np.log1p(np.exp(-np.abs(logits)))
    )


def reference_criterion_np(
    logits, boxes, labels_list, tgt_list, mcfg: MatcherConfig, lcfg: LossConfig, num_classes
):
    """Numpy oracle of the reference criterion on ragged (unpadded) targets.

    Matching done per image with scipy (as the reference does, but with the
    batch-0 bug fixed — each image matched against its own predictions).
    """
    b, q, c = logits.shape
    indices = []
    for i in range(b):
        if len(labels_list[i]) == 0:
            indices.append((np.zeros(0, int), np.zeros(0, int)))
            continue
        cost = reference_cost_np(logits[i], boxes[i], labels_list[i], tgt_list[i], mcfg)
        ri, ci = linear_sum_assignment(cost)
        indices.append((ri, ci))

    num_boxes = max(sum(len(l) for l in labels_list), 1)

    # loss_labels (losses.py:96-147)
    target_classes = np.full((b, q), num_classes, np.int64)
    for i, (ri, ci) in enumerate(indices):
        target_classes[i, ri] = labels_list[i][ci]
    onehot = np.zeros((b, q, num_classes + 1), np.float32)
    np.put_along_axis(onehot, target_classes[..., None], 1.0, axis=2)
    onehot = onehot[..., :num_classes]
    prob = _sigmoid(logits)
    pt = prob * onehot + (1 - prob) * (1 - onehot)
    focal_w = (1 - pt) ** lcfg.focal_gamma
    alpha_w = lcfg.focal_alpha * onehot + (1 - lcfg.focal_alpha) * (1 - onehot)
    loss_ce = (alpha_w * focal_w * _bce_logits_np(logits, onehot)).sum() / num_boxes

    # loss_boxes (losses.py:149-187)
    src, tgt = [], []
    for i, (ri, ci) in enumerate(indices):
        if len(ri):
            src.append(boxes[i, ri])
            tgt.append(tgt_list[i][ci])
    if src:
        src = np.concatenate(src)
        tgt = np.concatenate(tgt)
        loss_bbox = np.abs(src - tgt).sum() / num_boxes
        giou = np.diag(_giou_np(_cxcywh_to_xyxy(src), _cxcywh_to_xyxy(tgt)))
        loss_giou = (1 - giou).sum() / num_boxes
    else:
        loss_bbox = loss_giou = 0.0

    return {
        "loss_ce": lcfg.weight_ce * loss_ce,
        "loss_bbox": lcfg.weight_bbox * loss_bbox,
        "loss_giou": lcfg.weight_giou * loss_giou,
    }


def _make_batch(rng, b=3, q=10, g_max=6, c=8, n_valid=(4, 0, 6)):
    logits = rng.normal(size=(b, q, c)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.6, size=(b, q, 4)).astype(np.float32)
    labels = rng.integers(0, c, size=(b, g_max)).astype(np.int32)
    tgt = rng.uniform(0.2, 0.6, size=(b, g_max, 4)).astype(np.float32)
    valid = np.zeros((b, g_max), bool)
    for i, nv in enumerate(n_valid):
        valid[i, :nv] = True
    return logits, boxes, labels, tgt, valid


def test_focal_bce_hand_value():
    # logit 0 -> p=0.5; target 1: bce=log(2), pt=0.5, w=(0.5)^2, a=0.25
    logits = jnp.zeros((1, 1))
    tgt = jnp.ones((1, 1))
    out = float(sigmoid_focal_bce(logits, tgt, 0.25, 2.0)[0, 0])
    np.testing.assert_allclose(out, 0.25 * 0.25 * np.log(2.0), rtol=1e-6)


def test_criterion_matches_reference_oracle(rng):
    mcfg, lcfg = MatcherConfig(), LossConfig()
    c = 8
    logits, boxes, labels, tgt, valid = _make_batch(rng, c=c)

    out = set_criterion(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(tgt), jnp.asarray(valid),
        matcher_cfg=mcfg, loss_cfg=lcfg, num_classes=c,
    )

    labels_list = [labels[i][valid[i]] for i in range(len(labels))]
    tgt_list = [tgt[i][valid[i]] for i in range(len(tgt))]
    oracle = reference_criterion_np(logits, boxes, labels_list, tgt_list, mcfg, lcfg, c)

    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        np.testing.assert_allclose(
            float(out[k]), oracle[k], rtol=1e-4, atol=1e-5
        ), k


def test_criterion_all_empty_targets(rng):
    """No GT anywhere: box losses 0, CE normalized by clamp(num_boxes, 1)."""
    mcfg, lcfg = MatcherConfig(), LossConfig()
    c = 5
    logits, boxes, labels, tgt, valid = _make_batch(rng, b=2, c=c, n_valid=(0, 0))
    out = set_criterion(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(tgt), jnp.asarray(valid),
        matcher_cfg=mcfg, loss_cfg=lcfg, num_classes=c,
    )
    assert float(out["loss_bbox"]) == 0.0
    assert float(out["loss_giou"]) == 0.0
    assert float(out["num_boxes"]) == 1.0
    oracle = reference_criterion_np(
        logits, boxes, [np.zeros(0, np.int32)] * 2,
        [np.zeros((0, 4), np.float32)] * 2, mcfg, lcfg, c,
    )
    np.testing.assert_allclose(float(out["loss_ce"]), oracle["loss_ce"], rtol=1e-4)


def test_criterion_gradients_flow(rng):
    """Gradients flow to predictions but not through the matching indices."""
    import jax

    mcfg, lcfg = MatcherConfig(), LossConfig()
    c = 6
    logits, boxes, labels, tgt, valid = _make_batch(rng, b=2, c=c, n_valid=(3, 2))

    def loss_fn(lg, bx):
        out = set_criterion(
            lg, bx, jnp.asarray(labels), jnp.asarray(tgt), jnp.asarray(valid),
            matcher_cfg=mcfg, loss_cfg=lcfg, num_classes=c,
        )
        return out["loss"]

    g_logits, g_boxes = jax.grad(loss_fn, argnums=(0, 1))(
        jnp.asarray(logits), jnp.asarray(boxes)
    )
    assert np.isfinite(np.asarray(g_logits)).all()
    assert np.isfinite(np.asarray(g_boxes)).all()
    assert np.abs(np.asarray(g_logits)).sum() > 0
    assert np.abs(np.asarray(g_boxes)).sum() > 0
