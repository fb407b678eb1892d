"""Multi-head attention entry point.

One call site for all attention in the framework, with selectable
implementation:

- 'xla': plain einsum + fp32 softmax. Always available (CPU tests, small
  shapes, fallback).
- 'pallas': fused flash-attention TPU kernel (ops/flash_attention.py) —
  memory-linear in sequence length, fp32 accumulation.
- 'auto': pallas on TPU when shapes qualify, else xla.

Replaces the reference's torch SDPA/cuDNN attention inside the HF DINOv2
encoder (dino_detector/models/dinov2_backbone.py:60) and the decoder's
nn.MultiheadAttention (deformable_attention.py:195).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    impl: str = "auto",
) -> jnp.ndarray:
    """Scaled dot-product attention over heads.

    Args:
      q: [B, Sq, H, Dh]
      k, v: [B, Sk, H, Dh]
      impl: 'xla' | 'pallas' | 'auto'.

    Returns:
      [B, Sq, H, Dh]
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    if impl == "auto":
        impl = "pallas" if _pallas_eligible(q, k) else "xla"
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale)


def _pallas_eligible(q, k) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # Measured on v5e: at >=512 keys the blocked flash kernel wins 2.1x
    # (XLA spills [S, S] logits to HBM). At ViT@224's 257 tokens the
    # head-grouped kernel variant ties XLA in isolation but wins ~7% on
    # the full train step (564 vs 526 img/s) by keeping fp32 logits in
    # VMEM. Below ~192 keys (decoder-sized) XLA's fused GEMM wins.
    return q.shape[-1] % 64 == 0 and k.shape[1] >= 192
