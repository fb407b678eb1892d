"""Set-prediction losses: focal classification + L1 + GIoU on matched pairs.

Numerically reproduces the reference SetCriterion (dino_detector/losses.py:
96-187) with padded, static-shape targets:

- `loss_labels`: sigmoid focal BCE over one-hot targets with a "no-object"
  class `num_classes` appended then dropped (losses.py:116-147).
- `loss_boxes`: L1 + (1 - diag GIoU) on matched pairs only (losses.py:
  149-187).
- Normalization by the global number of GT boxes, all-reduced across data
  parallel workers and clamped to >= 1 (losses.py:225-230). Under jit with
  sharded inputs the cross-device sum is implicit in `jnp.sum` over the
  global batch — XLA inserts the collective.

The matcher indices arrive as a padded [B, G] query-per-GT map instead of
the reference's ragged per-image index lists.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from ..config import LossConfig, MatcherConfig
from .boxes import box_cxcywh_to_xyxy, elementwise_generalized_box_iou
from .matching import MatchResult, hungarian_match


def sigmoid_focal_bce(
    logits: jnp.ndarray,
    targets_onehot: jnp.ndarray,
    alpha: float,
    gamma: float,
) -> jnp.ndarray:
    """Elementwise focal binary cross-entropy.

    loss = alpha_t * (1 - p_t)^gamma * BCE(logits, targets)

    Matches the reference formulation (losses.py:137-144), including the
    standalone FocalLoss module (losses.py:9-68).
    """
    logits = logits.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits)
    # Numerically-stable BCE with logits.
    bce = jnp.maximum(logits, 0.0) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = prob * targets_onehot + (1.0 - prob) * (1.0 - targets_onehot)
    focal_weight = (1.0 - p_t) ** gamma
    alpha_weight = alpha * targets_onehot + (1.0 - alpha) * (1.0 - targets_onehot)
    return alpha_weight * focal_weight * bce


def loss_labels(
    pred_logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    match: MatchResult,
    num_boxes: jnp.ndarray,
    num_classes: int,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Focal classification loss over all queries.

    Args:
      pred_logits: [B, Q, C]
      gt_labels: [B, G]
      match: matching result (query_of_gt [B, G], match_valid [B, G]).
      num_boxes: scalar normalizer (global valid GT count, clamped >= 1).
      num_classes: C.

    Reference: losses.py:96-147. Every query's target defaults to the
    "no-object" class C (one-hot all-zero after dropping the appended
    column); matched queries get their GT label.
    """
    b, q, c = pred_logits.shape
    # target_classes [B, Q] defaulting to the no-object index C.
    target_classes = jnp.full((b, q), num_classes, dtype=jnp.int32)
    # Scatter matched GT labels into their query slots; invalid matches are
    # routed to a trash column Q (sliced off) to keep shapes static.
    scatter_q = jnp.where(match.match_valid, match.query_of_gt, q)
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], scatter_q.shape
    )
    padded = jnp.full((b, q + 1), num_classes, dtype=jnp.int32)
    padded = padded.at[batch_idx, scatter_q].set(gt_labels.astype(jnp.int32))
    target_classes = padded[:, :q]

    # One-hot with the extra no-object column appended then dropped
    # (reference: losses.py:132-135).
    onehot = jax.nn.one_hot(target_classes, num_classes + 1, dtype=jnp.float32)
    onehot = onehot[..., :num_classes]

    loss = sigmoid_focal_bce(pred_logits, onehot, alpha, gamma)
    return jnp.sum(loss) / num_boxes


def loss_boxes(
    pred_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    match: MatchResult,
    num_boxes: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """L1 + GIoU losses on matched (query, GT) pairs.

    Args:
      pred_boxes: [B, Q, 4] cxcywh.
      gt_boxes: [B, G, 4] cxcywh.
      match: matching result.
      num_boxes: scalar normalizer.

    Reference: losses.py:149-187.
    """
    # Gather the predicted box matched to each GT slot.
    gather_q = jnp.clip(match.query_of_gt, 0, pred_boxes.shape[1] - 1)
    src = jnp.take_along_axis(pred_boxes, gather_q[..., None], axis=1)  # [B,G,4]
    mask = match.match_valid.astype(jnp.float32)

    l1 = jnp.sum(jnp.abs(src - gt_boxes), axis=-1) * mask
    loss_bbox = jnp.sum(l1) / num_boxes

    giou = elementwise_generalized_box_iou(
        box_cxcywh_to_xyxy(src), box_cxcywh_to_xyxy(gt_boxes)
    )
    # Mask before the (1 - giou) so padded slots contribute exactly 0.
    loss_giou = jnp.sum((1.0 - giou) * mask) / num_boxes

    return {"loss_bbox": loss_bbox, "loss_giou": loss_giou}


@functools.partial(
    jax.jit,
    static_argnames=("matcher_cfg", "loss_cfg", "num_classes", "return_match"),
)
def set_criterion(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    matcher_cfg: MatcherConfig = MatcherConfig(),
    loss_cfg: LossConfig = LossConfig(),
    num_classes: int = 91,
    match: MatchResult | None = None,
    return_match: bool = False,
):
    """Full DETR-style criterion: match then weighted losses.

    Args:
      pred_logits: [B, Q, C]; pred_boxes: [B, Q, 4] cxcywh.
      gt_labels: [B, G]; gt_boxes: [B, G, 4]; gt_valid: [B, G] bool.
      match: a precomputed assignment to reuse instead of re-matching
        (TrainConfig.share_aux_match: auxiliary decoder layers reuse the
        final layer's match — DETR matches each layer independently, but
        at COCO GT density the matcher is a large step fraction and this
        trades exactness of the deep-supervision signal for L-1 fewer
        solves; see BENCH.md).
      return_match: also return the MatchResult (for reuse by the caller).

    Returns:
      dict with weighted 'loss_ce', 'loss_bbox', 'loss_giou' and 'loss'
      (their sum), plus the unweighted values under '*_unweighted';
      (dict, MatchResult) when return_match.

    Reference: losses.py:210-241. num_boxes is the global (cross-device)
    count of valid GT, clamped to >= 1 (losses.py:225-230); under pjit the
    sum over the sharded batch lowers to an all-reduce automatically.
    """
    if match is None:
        match = hungarian_match(
            pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, matcher_cfg
        )
    num_boxes = jnp.maximum(jnp.sum(gt_valid.astype(jnp.float32)), 1.0)

    ce = loss_labels(
        pred_logits,
        gt_labels,
        match,
        num_boxes,
        num_classes,
        loss_cfg.focal_alpha,
        loss_cfg.focal_gamma,
    )
    box_losses = loss_boxes(pred_boxes, gt_boxes, match, num_boxes)

    out = {
        "loss_ce": loss_cfg.weight_ce * ce,
        "loss_bbox": loss_cfg.weight_bbox * box_losses["loss_bbox"],
        "loss_giou": loss_cfg.weight_giou * box_losses["loss_giou"],
        "loss_ce_unweighted": ce,
        "loss_bbox_unweighted": box_losses["loss_bbox"],
        "loss_giou_unweighted": box_losses["loss_giou"],
        "num_boxes": num_boxes,
    }
    out["loss"] = out["loss_ce"] + out["loss_bbox"] + out["loss_giou"]
    if return_match:
        return out, match
    return out
