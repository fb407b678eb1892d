"""Box coordinate conversions and (G)IoU, as pure jnp functions.

Semantics match the reference torch implementations
(dino_detector/utils.py:73-164), generalized to arbitrary leading batch
dimensions so they vectorize cleanly under vmap/jit on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Shape [..., 4].

    Reference: dino_detector/utils.py:73-92.
    """
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Shape [..., 4].

    Reference: dino_detector/utils.py:95-108.
    """
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes. [..., 4] -> [...].

    Reference: dino_detector/utils.py:111-121.
    """
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU and union between two xyxy box sets.

    Args:
      boxes1: [..., N, 4]
      boxes2: [..., M, 4]
    Returns:
      (iou, union), each [..., N, M].
    """
    area1 = box_area(boxes1)  # [..., N]
    area2 = box_area(boxes2)  # [..., M]

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    intersection = wh[..., 0] * wh[..., 1]  # [..., N, M]

    union = area1[..., :, None] + area2[..., None, :] - intersection
    iou = intersection / union
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise generalized IoU between xyxy box sets.

    GIoU = IoU - (enclosing_area - union) / enclosing_area.

    Args:
      boxes1: [..., N, 4]
      boxes2: [..., M, 4]
    Returns:
      [..., N, M] pairwise GIoU.

    Reference: dino_detector/utils.py:124-164. Like the reference, division
    by a zero union/enclosing area is not guarded — callers must provide
    non-degenerate boxes (the dataset filters them; dataset.py:80-91).
    """
    iou, union = pairwise_box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    enclosing = wh[..., 0] * wh[..., 1]

    return iou - (enclosing - union) / enclosing


def elementwise_generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise GIoU between aligned xyxy boxes: [..., 4] x [..., 4] -> [...].

    Equivalent to diag(generalized_box_iou(a, b)) used by the box loss
    (reference: dino_detector/losses.py:178-181) without materializing the
    N x N pairwise matrix.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    intersection = wh[..., 0] * wh[..., 1]

    union = area1 + area2 - intersection
    iou = intersection / union

    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0)
    enclosing = wh_e[..., 0] * wh_e[..., 1]

    return iou - (enclosing - union) / enclosing
