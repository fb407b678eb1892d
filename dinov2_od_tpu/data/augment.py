"""Device-side, in-jit train-time augmentation (beyond reference).

The reference has NO data augmentation at all — its transform pipeline is
`Resize((224,224)) + ToTensor()` (reference train.py:584-587), applied on
host CPU workers. This module provides the standard detection-training
augmentations (horizontal flip, color jitter, scale/translate jitter) as
pure jittable functions that run ON DEVICE inside the train step:

- Zero host cost: on this machine one CPU core feeds the chip; host-side
  augmentation would eat directly into the decode budget (BENCH.md "train
  from disk"). On device the elementwise ops fuse into the existing
  /255 + normalize prologue and the resampling is two batched GEMMs.
- MXU-shaped resampling: the random zoom/crop is a separable bilinear
  resample expressed as two einsums with per-image [H,H] / [W,W] weight
  matrices (out = Wy @ img @ Wx^T), not a gather — gathers lower to slow
  dynamic-gather loops on TPU (same lesson as ops/deformable.py's one-hot
  MXU contraction).
- Static shapes: every image keeps [H, W]; boxes are transformed in
  normalized coordinates and boxes pushed out of frame are dropped by
  clearing their `valid` bit (the padded-GT representation absorbs the
  raggedness — no dynamic shapes under jit). This fixed-canvas zoom is
  also the TPU answer to DETR-style multi-scale training: resolution
  bucketing would compile one XLA program per size; zooming inside a
  constant canvas gives the scale augmentation with ONE program.

Geometry convention (cxcywh boxes, normalized [0,1], images [B,H,W,3]
float in [0,1]):
  output pixel i samples input coordinate u = (i + 0.5 - t) / s - 0.5,
  so normalized box coords transform as  x' = s * x + t / size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import AugmentConfig
from ..ops.boxes import box_cxcywh_to_xyxy, box_xyxy_to_cxcywh

# Rec. 601 luma, the torchvision grayscale convention. Kept as a plain
# numpy constant: a module-level jnp.array would be materialized at import
# time, and this module may first be imported inside an active jit trace
# (train/step.py imports it lazily) — device constants created mid-trace
# leak that trace and poison later compilations.
import numpy as np

_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def _resample_matrix(n: int, scale: jnp.ndarray, translate: jnp.ndarray):
    """[n_out, n_in] bilinear (tent) resampling weights for one axis.

    Output pixel i reads input coordinate u_i = (i + 0.5 - t)/s - 0.5;
    weights W[i, j] = max(0, 1 - |u_i - j|) select the two neighbours.
    Coordinates outside the input get all-zero rows → implicit black
    fill (matches torchvision's pad-with-zeros for zoom-out)."""
    i = jnp.arange(n, dtype=jnp.float32)
    u = (i + 0.5 - translate) / scale - 0.5
    j = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - j[None, :]))


def _hflip(
    key: jax.Array, prob: float, images: jnp.ndarray, boxes: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    flip = jax.random.bernoulli(key, prob, (images.shape[0],))
    images = jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)
    cx = jnp.where(flip[:, None], 1.0 - boxes[..., 0], boxes[..., 0])
    boxes = jnp.concatenate([cx[..., None], boxes[..., 1:]], axis=-1)
    return images, boxes


def _scale_jitter(
    key: jax.Array,
    strength: float,
    min_box_size: float,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random aspect-preserving zoom in [1-strength, 1+strength] with a
    uniformly random placement: zoom-out pads (content lands fully in
    frame), zoom-in crops. Boxes follow the affine map and are clipped;
    boxes that shrink below min_box_size are invalidated."""
    B, H, W, _ = images.shape
    ks, kx, ky = jax.random.split(key, 3)
    s = jax.random.uniform(
        ks, (B,), minval=1.0 - strength, maxval=1.0 + strength
    )
    # t uniform between 0 and size*(1-s): for s<1 that places the padded
    # content anywhere inside the frame; for s>1 it picks the crop window.
    tx = W * (1.0 - s) * jax.random.uniform(kx, (B,))
    ty = H * (1.0 - s) * jax.random.uniform(ky, (B,))
    return apply_scale_translate(images, boxes, valid, s, tx, ty, min_box_size)


def apply_scale_translate(
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    s: jnp.ndarray,
    tx: jnp.ndarray,
    ty: jnp.ndarray,
    min_box_size: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Deterministic core of the scale jitter: per-image zoom s[B] and
    pixel translation (tx, ty)[B], applied to images (separable bilinear,
    two batched GEMMs) and boxes (x' = s*x + t/size, clipped)."""
    B, H, W, _ = images.shape
    wy = jax.vmap(lambda sc, t: _resample_matrix(H, sc, t))(s, ty)
    wx = jax.vmap(lambda sc, t: _resample_matrix(W, sc, t))(s, tx)
    # Separable resample as two batched GEMMs (MXU): rows then columns.
    tmp = jnp.einsum("bij,bjwc->biwc", wy, images)
    images = jnp.einsum("bkw,bhwc->bhkc", wx, tmp)

    xyxy = box_cxcywh_to_xyxy(boxes)
    sx = s[:, None]
    shift_x = (tx / W)[:, None]
    shift_y = (ty / H)[:, None]
    x0 = jnp.clip(xyxy[..., 0] * sx + shift_x, 0.0, 1.0)
    y0 = jnp.clip(xyxy[..., 1] * sx + shift_y, 0.0, 1.0)
    x1 = jnp.clip(xyxy[..., 2] * sx + shift_x, 0.0, 1.0)
    y1 = jnp.clip(xyxy[..., 3] * sx + shift_y, 0.0, 1.0)
    boxes = box_xyxy_to_cxcywh(jnp.stack([x0, y0, x1, y1], axis=-1))
    keep = (boxes[..., 2] > min_box_size) & (boxes[..., 3] > min_box_size)
    return images, boxes, valid & keep


def _color_jitter(
    key: jax.Array, strength: float, images: jnp.ndarray
) -> jnp.ndarray:
    """Per-image brightness, contrast, and saturation factors drawn from
    U[1-strength, 1+strength] (torchvision ColorJitter semantics on [0,1]
    RGB). Pure elementwise + per-image reductions — fuses on the VPU."""
    B = images.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    lo, hi = 1.0 - strength, 1.0 + strength
    b = jax.random.uniform(kb, (B, 1, 1, 1), minval=lo, maxval=hi)
    c = jax.random.uniform(kc, (B, 1, 1, 1), minval=lo, maxval=hi)
    g = jax.random.uniform(ks, (B, 1, 1, 1), minval=lo, maxval=hi)
    x = images * b
    gray = jnp.einsum("bhwc,c->bhw", x, _LUMA)[..., None]
    mean = jnp.mean(gray, axis=(1, 2, 3), keepdims=True)
    x = mean + (x - mean) * c          # contrast about the gray mean
    x = gray + (x - gray) * g          # saturation toward per-pixel gray
    return jnp.clip(x, 0.0, 1.0)


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: AugmentConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Apply the enabled augmentations to a batch.

    images: [B, H, W, 3] float32 in [0, 1] (un-normalized RGB — the train
    step un-normalizes / re-normalizes around this call; both affine maps
    fuse away). boxes: [B, G, 4] cxcywh in [0,1]. valid: [B, G] bool.
    All branches are static on cfg — disabled augmentations add zero ops.
    """
    k_flip, k_scale, k_color = jax.random.split(rng, 3)
    if cfg.hflip_prob > 0:
        images, boxes = _hflip(k_flip, cfg.hflip_prob, images, boxes)
    if cfg.scale_jitter > 0:
        images, boxes, valid = _scale_jitter(
            k_scale, cfg.scale_jitter, cfg.min_box_size, images, boxes, valid
        )
    if cfg.color_jitter > 0:
        images = _color_jitter(k_color, cfg.color_jitter, images)
    return images, boxes, valid
