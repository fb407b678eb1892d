"""Device-side detection post-processing.

The reference post-processes on the host with a Python triple loop over
(image, class, detection) and per-batch `.cpu().numpy()` copies
(dino_detector/utils.py:195-233). Here the heavy part — sigmoid, box
conversion, rescaling, top-k selection over all (query, class) pairs —
runs jitted on device; the host only formats the already-small top-k
result into COCO dicts.

Two behavioral fixes over the reference, controlled by parity_mode
(SURVEY.md §7.3):
- boxes are rescaled to original image pixels (the reference emits
  normalized [0,1] boxes, systematically depressing AP);
- class 0 is NOT skipped (the reference treats contiguous index 0 —
  'person' — as background);
- category ids are mapped back to real COCO category ids by the caller
  via label_to_cat_id (the reference emits contiguous indices).
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import box_cxcywh_to_xyxy


@functools.partial(jax.jit, static_argnames=("max_detections", "parity_mode"))
def select_topk_detections(
    pred_logits: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    orig_sizes: jnp.ndarray,
    max_detections: int = 100,
    parity_mode: bool = False,
):
    """Top-k detections over all (query, class) pairs, per image.

    Args:
      pred_logits: [B, Q, C]; pred_boxes: [B, Q, 4] cxcywh in [0,1].
      orig_sizes: [B, 2] (height, width) original pixel sizes.

    Returns:
      scores [B, K], labels [B, K] (contiguous), boxes_xywh [B, K, 4]
      (COCO xywh; original pixels unless parity_mode).
    """
    b, q, c = pred_logits.shape
    scores_all = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    if parity_mode:
        # Reference skips contiguous class 0 as "background" (utils.py:210).
        scores_all = scores_all.at[:, :, 0].set(-1.0)
    flat = scores_all.reshape(b, q * c)
    k = min(max_detections, q * c)
    top_scores, top_idx = jax.lax.top_k(flat, k)
    top_query = top_idx // c
    top_label = top_idx % c

    boxes_xyxy = box_cxcywh_to_xyxy(pred_boxes.astype(jnp.float32))
    sel_boxes = jnp.take_along_axis(boxes_xyxy, top_query[..., None], axis=1)

    if not parity_mode:
        hw = orig_sizes.astype(jnp.float32)  # [B, 2] (h, w)
        scale = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)
        sel_boxes = sel_boxes * scale[:, None, :]

    xywh = jnp.concatenate(
        [sel_boxes[..., :2], sel_boxes[..., 2:] - sel_boxes[..., :2]], axis=-1
    )
    return top_scores, top_label, xywh


def format_detections(
    scores,
    labels,
    boxes,
    image_ids,
    label_to_cat_id: Dict[int, int],
    score_threshold: float = 0.05,
    parity_mode: bool = False,
) -> List[dict]:
    """Host-side formatting of already-selected top-k detections
    ([B, K] scores/labels, [B, K, 4] xywh boxes) into COCO result dicts.

    This is the only part of post-processing that must run on the host
    (COCO results are JSON dicts); the selection itself should run fused
    in the eval step (train/step.py::make_eval_topk_step) so only these
    compact arrays cross the device->host link.
    """
    ids, cats, bx, s = select_above_threshold(
        scores, labels, boxes, image_ids, label_to_cat_id,
        score_threshold=score_threshold, parity_mode=parity_mode,
    )
    return [
        {"image_id": ii, "category_id": cc, "bbox": bb, "score": ss}
        for ii, cc, bb, ss in zip(
            ids.tolist(), cats.tolist(), bx.tolist(), s.tolist()
        )
    ]


def select_above_threshold(
    scores,
    labels,
    boxes,
    image_ids,
    label_to_cat_id: Dict[int, int],
    score_threshold: float = 0.05,
    parity_mode: bool = False,
):
    """Array-native detection filtering: the exact selection
    format_detections applies, returned as flat numpy arrays
    (image_ids [N], category_ids [N], boxes [N, 4] xywh, scores [N])
    with no dict materialization.

    Vectorized: one boolean mask + a label->category LUT instead of
    per-detection float()/int() calls — at K=100 detections/image the
    Python-loop version dominated cached-eval wall clock (BENCH.md
    "device cache" section). Feed the result straight into
    CocoEvaluator.evaluate_arrays to skip COCO dict building entirely on
    the validation cadence (dicts remain only for predictions.json)."""
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    boxes = np.asarray(boxes)
    img_ids = np.asarray(image_ids)

    keep = scores > score_threshold
    ids = np.broadcast_to(img_ids.reshape(-1, 1), scores.shape)[keep]
    s = scores[keep]
    l = labels[keep].astype(np.int64)
    bx = boxes[keep]
    if parity_mode or not label_to_cat_id:
        cats = l  # reference emits the contiguous index
    else:
        hi = int(max(l.max(initial=0), max(label_to_cat_id))) + 1
        lut = np.arange(hi, dtype=np.int64)  # identity for unknown labels
        for k, v in label_to_cat_id.items():
            if 0 <= k < hi:
                lut[k] = v
        cats = lut[np.clip(l, 0, hi - 1)]
    return ids, cats, bx, s


def postprocess_detections(
    pred_logits,
    pred_boxes,
    image_ids,
    orig_sizes,
    label_to_cat_id: Dict[int, int],
    score_threshold: float = 0.05,
    max_detections: int = 100,
    parity_mode: bool = False,
) -> List[dict]:
    """Convert raw model outputs for a batch into COCO result dicts.

    score_threshold matches the reference's 0.05 (utils.py:214).

    Note for hot paths: this uploads full [B, Q, C] logits to the device
    for the top-k and reads the result back — three link crossings per
    batch. evaluate_dataset instead fuses select_topk_detections into
    the eval step and calls format_detections on the compact result;
    this function remains for one-shot uses and for scoring host-side
    (e.g. torch reference) outputs with the identical protocol.
    """
    scores, labels, boxes = select_topk_detections(
        jnp.asarray(pred_logits),
        jnp.asarray(pred_boxes),
        jnp.asarray(orig_sizes),
        max_detections=max_detections,
        parity_mode=parity_mode,
    )
    return format_detections(
        scores, labels, boxes, image_ids, label_to_cat_id,
        score_threshold=score_threshold, parity_mode=parity_mode,
    )
