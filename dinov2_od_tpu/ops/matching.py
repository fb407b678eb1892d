"""Batched set-prediction matching: cost matrix + on-device Hungarian solve.

Reproduces the matching semantics of the reference HungarianMatcher
(dino_detector/matching.py:43-122) — focal classification cost + L1 box cost
+ GIoU cost, optimally assigned per image — but fully vectorized and on
device with static shapes:

- targets are padded to a fixed number of GT slots with a validity mask
  (the reference uses ragged per-image lists, dataset.py:102-111);
- the per-image scipy host solve (matching.py:105) becomes a vmapped
  `hungarian_assign` over a square padded cost matrix;
- the reference's batch-0 bug — every image matched against image 0's
  predictions because the flattened cost matrix is sliced `C[:num_queries]`
  (matching.py:63-64,102) — is fixed: each image is matched against its own
  predictions.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import MatcherConfig
from .auction import auction_assign
from .boxes import box_cxcywh_to_xyxy, generalized_box_iou
from .hungarian import hungarian_assign, invert_assignment

# Cost assigned to padding rows/columns of the square assignment problem.
# Must dominate any real cost (|real| <~ cost_bbox*4 + cost_giou*2 +
# cost_class*~20) without losing fp32 resolution in the solver's duals.
PAD_COST = 1e4


class MatchResult(NamedTuple):
    """Per-image matching, in padded/masked form.

    query_of_gt: [B, G] int32 — query index matched to each GT slot
      (-1 for invalid/unmatched slots).
    match_valid: [B, G] bool — True where a valid GT slot got a real query.
    """

    query_of_gt: jnp.ndarray
    match_valid: jnp.ndarray


def matching_cost_matrix(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: MatcherConfig,
) -> jnp.ndarray:
    """Per-image matching cost.

    Args:
      pred_logits: [Q, C] raw class logits.
      pred_boxes: [Q, 4] cxcywh in [0, 1].
      gt_labels: [G] int labels (arbitrary values in padded slots).
      gt_boxes: [G, 4] cxcywh (zeros in padded slots).
      gt_valid: [G] bool.
      cfg: cost weights (reference defaults: class 1, bbox 5, giou 2;
        config.py:44-46).

    Returns:
      [Q, G] cost; padded GT columns hold PAD_COST.
    """
    num_classes = pred_logits.shape[-1]
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))  # [Q, C]

    # Focal-style classification cost (reference: matching.py:80-86).
    alpha, gamma = cfg.focal_alpha, cfg.focal_gamma
    # NOTE: (1 - prob) computed BEFORE adding the epsilon, matching the
    # reference order (matching.py:82) — log1p(-prob + 1e-8) would round the
    # epsilon away at prob == 1 in fp32 and produce -inf.
    neg_cost = (1.0 - alpha) * (prob**gamma) * (-jnp.log((1.0 - prob) + 1e-8))
    pos_cost = alpha * ((1.0 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    labels_safe = jnp.clip(gt_labels, 0, num_classes - 1)
    cost_class = (
        pos_cost[:, labels_safe] - neg_cost[:, labels_safe]
    )  # [Q, G]

    # L1 box cost (reference: matching.py:89).
    cost_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]), axis=-1
    )

    # GIoU cost (reference: matching.py:92-95).
    cost_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )

    cost = (
        cfg.cost_class * cost_class
        + cfg.cost_bbox * cost_bbox
        + cfg.cost_giou * cost_giou
    )
    # Degenerate boxes can produce non-finite GIoU; clamp so the solver's
    # dual updates stay well-conditioned. Padded GT columns get PAD_COST.
    cost = jnp.clip(jnp.nan_to_num(cost, nan=PAD_COST), -PAD_COST, PAD_COST)
    return jnp.where(gt_valid[None, :], cost, PAD_COST)


def _match_one_image(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, cfg):
    num_queries = pred_logits.shape[0]
    num_gt = gt_labels.shape[0]
    n = max(num_queries, num_gt)

    cost_qg = matching_cost_matrix(
        pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid, cfg
    )

    solver = cfg.assignment
    if solver == "auto":
        # Threshold on the padded GT count (the number of augmenting
        # paths JV may need), NOT the square size n = max(Q, G): at
        # sparse GT (max_boxes <= ~32) the sequential JV solve is cheap
        # (~0.7 ms) and exact, so it stays the default there.
        solver = "auction" if num_gt >= cfg.auction_threshold else "jv"
    if solver == "auction":
        # Transposed orientation: queries (all real) bid for GT-slot
        # columns. The smaller, all-valid side bidding into spare
        # columns keeps auction contention low (see ops/auction.py).
        cost_qn = jnp.full((num_queries, n), PAD_COST, dtype=jnp.float32)
        cost_qn = cost_qn.at[:, :num_gt].set(cost_qg)
        # Clip the padding down to just above the real cost range: the
        # auction's eps is relative to the matrix range, so leaving pads at
        # PAD_COST would inflate the eps-optimality slack ~100x. Uniform
        # padding anywhere above the real max yields the same optimum.
        # "Real" excludes PAD_COST-substituted entries (NaN-poisoned
        # predictions): one poisoned row would otherwise inflate the
        # matrix range ~1e3x and with it the eps-optimality slack of
        # every other query.
        real = gt_valid[None, :] & (cost_qg < PAD_COST / 2)
        real_max = jnp.max(jnp.where(real, cost_qg, -jnp.inf))
        real_max = jnp.where(jnp.isfinite(real_max), real_max, 0.0)
        col_pad = jnp.ones((n,), bool).at[:num_gt].set(~gt_valid)
        query_of_col = auction_assign(
            jnp.minimum(cost_qn, real_max + 1.0),
            jnp.ones((num_queries,), bool),
            col_pad,
            # Square with all rows valid (Q >= G slots) has maximal
            # contention; eps-scaling is sound there because every
            # phase ends with all columns assigned. Q < G keeps the
            # provable single phase (spare columns keep contention low).
            scale_phases=(num_queries == n),
        )
        query_of_gt = query_of_col[:num_gt]
    else:
        # Square problem with GT as rows (so augmentations = #valid GT,
        # usually far below num_queries) and queries as columns.
        cost_sq = jnp.full((n, n), PAD_COST, dtype=jnp.float32)
        cost_sq = cost_sq.at[:num_gt, :num_queries].set(cost_qg.T)
        row_valid = jnp.zeros((n,), dtype=bool).at[:num_gt].set(gt_valid)
        gt_of_col = hungarian_assign(cost_sq, row_valid)  # [n]
        query_of_gt = invert_assignment(gt_of_col[:num_queries], num_gt)

    match_valid = (query_of_gt >= 0) & gt_valid
    return query_of_gt, match_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def hungarian_match(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: MatcherConfig = MatcherConfig(),
) -> MatchResult:
    """Batched optimal matching.

    Args:
      pred_logits: [B, Q, C]
      pred_boxes: [B, Q, 4] cxcywh
      gt_labels: [B, G] int32
      gt_boxes: [B, G, 4] cxcywh
      gt_valid: [B, G] bool
      cfg: matcher cost weights.

    Returns:
      MatchResult with query_of_gt [B, G] and match_valid [B, G].

    No gradients flow through the match (reference: @torch.no_grad,
    matching.py:42); outputs are integer indices so this holds trivially.
    """
    pred_logits = jax.lax.stop_gradient(pred_logits)
    pred_boxes = jax.lax.stop_gradient(pred_boxes)
    if cfg.replicate_batch0_bug:
        # Reference bug replication (matching.py:63-64,102): the cost
        # matrix is built from the batch-flattened predictions and sliced
        # C[:num_queries], i.e. image 0's rows, for every image b. The
        # criterion then applies those indices to image b's real outputs.
        # Equivalent formulation: match image-0 predictions against each
        # image's own GTs.
        pred_logits = jnp.broadcast_to(pred_logits[:1], pred_logits.shape)
        pred_boxes = jnp.broadcast_to(pred_boxes[:1], pred_boxes.shape)
    query_of_gt, match_valid = jax.vmap(
        lambda a, b, c, d, e: _match_one_image(a, b, c, d, e, cfg)
    )(pred_logits, pred_boxes, gt_labels, gt_boxes, gt_valid)
    return MatchResult(query_of_gt=query_of_gt, match_valid=match_valid)
