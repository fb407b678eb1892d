"""DETR decoder: learned object queries + (standard | deformable) layers.

Capability-equivalent to the reference DETRDecoder
(dino_detector/models/detr_decoder.py) and its deformable layer stack
(deformable_attention.py:186-308), rebuilt for TPU:

- Layers are *untied* by default — the reference accidentally reuses one
  layer instance N times (deformable_attention.py:284); `tie_layer_weights`
  reproduces that.
- The stack runs as `lax.scan` over stacked per-layer params (tied weights
  simply broadcast the same params each step).
- Deformable cross-attention is the vectorized gather kernel in
  ops/deformable.py instead of the reference's Python quadruple loop.
- Post-norm residual blocks with ReLU FFN, matching torch's
  nn.TransformerDecoderLayer and the reference deformable layer.

Heads: class logits Linear, 2-layer box MLP with sigmoid
(detr_decoder.py:40-41, utils.py:14-30).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.attention import multi_head_attention
from ..ops.deformable import (
    DeformableParams,
    deformable_attention,
    factor_spatial_shape,
    init_deformable_params,
)
from .layers import (
    dropout,
    layer_norm,
    layernorm_init,
    linear,
    torch_linear_init,
    xavier_linear_init,
)

Params = Dict[str, Any]


def _init_self_attn(rng: jax.Array, d: int) -> Params:
    kq, kk, kv, ko = jax.random.split(rng, 4)
    return {
        "q": xavier_linear_init(kq, d, d),
        "k": xavier_linear_init(kk, d, d),
        "v": xavier_linear_init(kv, d, d),
        "out": xavier_linear_init(ko, d, d),
    }


def _init_layer(rng: jax.Array, cfg: DecoderConfig) -> Params:
    d, f = cfg.hidden_dim, cfg.dim_feedforward
    keys = jax.random.split(rng, 8)
    p: Params = {
        "self_attn": _init_self_attn(keys[0], d),
        "ln1": layernorm_init(d),
        "ln2": layernorm_init(d),
        "ln3": layernorm_init(d),
        "fc1": torch_linear_init(keys[1], d, f),
        "fc2": torch_linear_init(keys[2], f, d),
    }
    if cfg.use_deformable:
        # Per-layer reference-point projection (deformable_attention.py:213).
        p["ref_proj"] = torch_linear_init(keys[3], d, 2)
        p["deform"] = init_deformable_params(
            keys[4], d, cfg.num_heads, cfg.n_points
        )._asdict()
    else:
        p["cross_attn"] = _init_self_attn(keys[5], d)
    return p


def init_decoder_params(rng: jax.Array, cfg: DecoderConfig) -> Params:
    keys = jax.random.split(rng, 6)
    d = cfg.hidden_dim

    n_unique = 1 if cfg.tie_layer_weights else cfg.num_layers
    layer_keys = jax.random.split(keys[0], n_unique)
    layers = [_init_layer(k, cfg) for k in layer_keys]
    if cfg.tie_layer_weights:
        layers = layers * cfg.num_layers
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    return {
        # torch nn.Embedding default: N(0, 1) (detr_decoder.py:15).
        "query_embed": jax.random.normal(keys[1], (cfg.num_queries, d)),
        "layers": stacked,
        "class_embed": torch_linear_init(keys[2], d, cfg.num_classes),
        "bbox_mlp": {
            "fc1": torch_linear_init(keys[3], d, d // 2),
            "fc2": torch_linear_init(keys[4], d // 2, 4),
        },
    }


def _self_attention_block(
    tgt: jnp.ndarray,
    p: Params,
    num_heads: int,
    drop_rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    b, q, d = tgt.shape
    dh = d // num_heads
    qh = linear(tgt, p["q"]).reshape(b, q, num_heads, dh)
    kh = linear(tgt, p["k"]).reshape(b, q, num_heads, dh)
    vh = linear(tgt, p["v"]).reshape(b, q, num_heads, dh)
    # Attention-probability dropout in train mode, matching the reference's
    # nn.MultiheadAttention(d_model, n_heads, dropout=dropout)
    # (deformable_attention.py:195).
    attn_rng = None if (deterministic or drop_rate == 0.0) else rng
    out = multi_head_attention(
        qh, kh, vh, impl="xla",
        dropout_rate=drop_rate, dropout_rng=attn_rng,
    ).reshape(b, q, d)
    return linear(out, p["out"])


def _cross_attention_block(
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    p: Params,
    num_heads: int,
) -> jnp.ndarray:
    b, q, d = tgt.shape
    s = memory.shape[1]
    dh = d // num_heads
    qh = linear(tgt, p["q"]).reshape(b, q, num_heads, dh)
    kh = linear(memory, p["k"]).reshape(b, s, num_heads, dh)
    vh = linear(memory, p["v"]).reshape(b, s, num_heads, dh)
    out = multi_head_attention(qh, kh, vh, impl="xla").reshape(b, q, d)
    return linear(out, p["out"])


def _layer_apply(
    tgt: jnp.ndarray,
    memory: jnp.ndarray,
    lp: Params,
    cfg: DecoderConfig,
    spatial_shape: Tuple[int, int],
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """One decoder layer, post-norm (reference: deformable_attention.py:
    215-268 / torch TransformerDecoderLayer)."""
    rngs = (
        jax.random.split(rng, 5) if rng is not None else [None] * 5
    )
    dr = cfg.dropout

    # Self-attention over queries (rngs[4] drops attention probabilities,
    # rngs[0] the residual branch — independent masks).
    sa = _self_attention_block(
        tgt, lp["self_attn"], cfg.num_heads, dr, rngs[4], deterministic
    )
    tgt = layer_norm(tgt + dropout(sa, dr, rngs[0], deterministic), lp["ln1"], eps=1e-5)

    # Cross-attention to encoder memory.
    if cfg.use_deformable:
        ref = jax.nn.sigmoid(linear(tgt, lp["ref_proj"]))  # [B, Q, 2]
        ca = deformable_attention(
            tgt,
            ref,
            memory,
            spatial_shape,
            DeformableParams(**lp["deform"]),
            cfg.num_heads,
            cfg.n_points,
        )
    else:
        ca = _cross_attention_block(tgt, memory, lp["cross_attn"], cfg.num_heads)
    tgt = layer_norm(tgt + dropout(ca, dr, rngs[1], deterministic), lp["ln2"], eps=1e-5)

    # FFN (ReLU, post-norm).
    h = jax.nn.relu(linear(tgt, lp["fc1"]))
    h = dropout(h, dr, rngs[2], deterministic)
    h = linear(h, lp["fc2"])
    tgt = layer_norm(tgt + dropout(h, dr, rngs[3], deterministic), lp["ln3"], eps=1e-5)
    return tgt


def decoder_apply(
    params: Params,
    cfg: DecoderConfig,
    memory: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Decode object queries against backbone features.

    Args:
      memory: [B, S, D] backbone features (CLS already dropped unless
        running in parity mode).

    Returns:
      {"pred_logits": [B, Q, num_classes], "pred_boxes": [B, Q, 4] cxcywh
       in [0, 1]}  (reference: detr_decoder.py:47-83).
    """
    b, s, d = memory.shape
    memory = memory.astype(jnp.dtype(cfg.dtype))
    # Static factorization of the flattened feature map (reference does this
    # at runtime per batch; deformable_attention.py:243-256).
    spatial_shape = factor_spatial_shape(s)

    tgt = jnp.broadcast_to(
        params["query_embed"][None].astype(memory.dtype),
        (b, cfg.num_queries, d),
    )

    # Intermediate layer outputs are collected (scan ys) only when the
    # aux-loss head needs them — i.e. in train mode; eval never reads
    # them, so collecting there would be (L-1) wasted head GEMMs per
    # batch. DETR-style deep supervision.
    collect = cfg.aux_loss and not deterministic
    if rng is not None:
        xs = (params["layers"], jax.random.split(rng, cfg.num_layers))
        body_fn = lambda c, x: (
            (out := _layer_apply(
                c, memory, x[0], cfg, spatial_shape, x[1], deterministic
            )),
            out if collect else None,
        )
    else:
        xs = params["layers"]
        body_fn = lambda c, lp: (
            (out := _layer_apply(c, memory, lp, cfg, spatial_shape, None, True)),
            out if collect else None,
        )
    # Fully unrolled: 2-6 layers; avoids the scan backward's
    # dynamic-update-slice gradient stacking (trace-verified cost).
    tgt, inter = jax.lax.scan(body_fn, tgt, xs, unroll=cfg.num_layers)

    def heads(x):
        logits = linear(x, params["class_embed"])
        h = jax.nn.relu(linear(x, params["bbox_mlp"]["fc1"]))
        boxes = jax.nn.sigmoid(linear(h, params["bbox_mlp"]["fc2"]))
        return logits.astype(jnp.float32), boxes.astype(jnp.float32)

    logits, boxes = heads(tgt)
    out = {"pred_logits": logits, "pred_boxes": boxes}
    if collect:
        # inter is [L, B, Q, D]; the shared heads score layers 0..L-2
        # (the final layer is the main output above). One batched head
        # call over the stacked layers — not L separate GEMMs.
        aux_logits, aux_boxes = heads(inter[:-1])
        out["aux_outputs"] = [
            {"pred_logits": aux_logits[i], "pred_boxes": aux_boxes[i]}
            for i in range(cfg.num_layers - 1)
        ]
    return out
