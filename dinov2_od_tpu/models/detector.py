"""The composed detector: DINOv2 backbone -> DETR decoder.

Reference: dino_detector/models/detector.py (DINOv2ObjectDetector).
Also home of the trainability policy: the backbone is frozen except LoRA
adapters on the last N blocks and the projection layer; the decoder is
fully trainable (reference: dinov2_backbone.py:40-51 — projection created
before the freeze loop, so it trains).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import DetectorConfig
from .decoder import decoder_apply, init_decoder_params
from .vit import backbone_apply, init_backbone_params

Params = Dict[str, Any]


import functools


@functools.partial(jax.jit, static_argnames="cfg")
def init_detector_params(rng: jax.Array, cfg: DetectorConfig) -> Params:
    # Jitted: eager init would dispatch hundreds of tiny ops (slow on
    # remote/tunnel device transports); one compiled program instead.
    kb, kd = jax.random.split(rng)
    return {
        "backbone": init_backbone_params(kb, cfg.backbone),
        "decoder": init_decoder_params(kd, cfg.decoder),
    }


def detector_apply(
    params: Params,
    cfg: DetectorConfig,
    pixel_values: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    attn_impl: str = "auto",
    use_remat: bool = False,
    mesh=None,
    seq_axis: str | None = None,
    batch_axis: str | None = None,
    tp_axis: str | None = None,
    pipe_axis: str | None = None,
    pipe_microbatches: int = 0,
    pipe_chunks: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Full forward pass.

    Args:
      pixel_values: [B, H, W, 3] images (NHWC).
      mesh / seq_axis: context parallelism — forwarded to the backbone's
        ring attention when attn_impl='ring' (the decoder's 50-query
        attention never needs sequence sharding).
      mesh / tp_axis: tensor parallelism — backbone attention runs inside
        a shard_map over head shards (ops/attention.py tp_axis) so the
        Pallas kernel is never all-gathered over the model axis. The
        decoder stays on the XLA path: its einsum attention partitions
        correctly under the Megatron specs, and its tiny sequences
        (<=50 queries) never dispatch to Pallas.
      mesh / pipe_axis / pipe_microbatches: pipeline parallelism — the
        backbone depth streams over the axis (parallel/pipeline.py).

    Returns:
      {"pred_logits": [B, Q, C], "pred_boxes": [B, Q, 4]}.
    """
    features = backbone_apply(
        params["backbone"],
        cfg.backbone,
        pixel_values,
        attn_impl=attn_impl,
        use_remat=use_remat,
        mesh=mesh,
        seq_axis=seq_axis,
        batch_axis=batch_axis,
        tp_axis=tp_axis,
        pipe_axis=pipe_axis,
        pipe_microbatches=pipe_microbatches,
        pipe_chunks=pipe_chunks,
    )
    moe_aux = None
    if cfg.backbone.ffn_type == "moe":
        features, moe_aux = features
    out = decoder_apply(
        params["decoder"],
        cfg.decoder,
        features,
        rng=rng,
        deterministic=deterministic,
    )
    if moe_aux is not None:
        # Router load-balance loss (ops/moe.py); the train step adds
        # backbone.moe_aux_weight * this to the objective.
        out["moe_aux"] = moe_aux
    return out


def trainable_mask(params: Params, cfg: DetectorConfig) -> Params:
    """Boolean pytree marking trainable leaves.

    Trainable: decoder (all), backbone projection, and LoRA (A, B) of the
    last `lora_last_n_blocks` encoder blocks. Everything else is frozen
    (reference: dinov2_backbone.py:40-51).

    Block params are stacked [depth, ...]; LoRA trainability is per-block,
    which the optimizer mask can't express leaf-wise — so LoRA leaves are
    marked trainable here and the per-block zeroing happens in
    `lora_block_multiplier` applied to updates.
    """

    def mark(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if keys and keys[0] == "decoder":
            return True
        if keys and keys[0] == "backbone":
            if "projection" in keys:
                return True
            if keys[-1] in ("lora_A", "lora_B"):
                return True
            # MoE router/expert weights are new capacity (no pretrained
            # MoE DINOv2 exists to freeze) and live only in the adapted
            # suffix stack ("moe_blocks", models/vit.py moe_boundary) —
            # all of them train. lora_last_n_blocks = depth gives
            # full-depth MoE.
            if "moe" in keys:
                return True
        return False

    return jax.tree_util.tree_map_with_path(mark, params)


def lora_block_multiplier(params: Params, cfg: DetectorConfig) -> Params:
    """Per-leaf multiplier zeroing LoRA updates for non-adapted blocks.

    Backbone block params are stacked along a leading depth axis; this
    returns a pytree (broadcastable against updates) that is 1.0 for the
    last `lora_last_n_blocks` entries of every lora_A/lora_B leaf and 0.0
    for earlier blocks, 1.0 for every other trainable leaf.
    """
    depth = cfg.backbone.depth
    first_adapted = max(0, depth - cfg.backbone.lora_last_n_blocks)

    def mult(path, leaf):
        keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if keys and keys[0] == "backbone":
            if "moe_blocks" in keys:
                # The MoE suffix stack holds ONLY adapted blocks (its
                # LoRA, router, and expert leaves all update).
                return jnp.ones((1,) * leaf.ndim, leaf.dtype)
            if keys[-1] in ("lora_A", "lora_B"):
                if cfg.backbone.ffn_type == "moe":
                    # "blocks" is the frozen dense prefix — never adapted.
                    return jnp.zeros((1,) * leaf.ndim, leaf.dtype)
                m = jnp.zeros((depth,) + (1,) * (leaf.ndim - 1), leaf.dtype)
                return m.at[first_adapted:].set(1.0)
        return jnp.ones((1,) * leaf.ndim, leaf.dtype)

    return jax.tree_util.tree_map_with_path(mult, params)


def fold_detector_lora(params: Params, cfg: DetectorConfig) -> Params:
    """Fold LoRA deltas into the backbone base kernels for serving:
    W' = W + alpha * A @ B per adapted linear, then zero the factors.

    The folded model computes each adapted linear as ONE GEMM instead of
    three; `detector_apply` output is bitwise-insensitive to the fold up to
    float addition order (validated in tests). Block params are stacked
    [depth, ...], so the fold is a single batched einsum per linear.

    Only the adapted blocks (the last `lora_last_n_blocks`) are folded —
    matching the apply path, which skips LoRA for earlier blocks because
    their factors are zero by construction (zero-init B + per-block
    masked updates).
    """
    alpha = cfg.backbone.lora_alpha
    depth = cfg.backbone.depth
    first = max(0, depth - cfg.backbone.lora_last_n_blocks)

    def fold_stack(blocks, adapted):
        blocks = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in blocks.items()}
        for lin in ("q", "k", "v", "proj", "fc1", "fc2"):
            if lin not in blocks:  # MoE blocks have no dense fc1/fc2
                continue
            bp = dict(blocks[lin])
            if "lora_A" in bp:
                delta = jnp.einsum("lir,lro->lio", bp["lora_A"], bp["lora_B"])
                # Cast the fp32 delta to the kernel's storage dtype BEFORE
                # the add: on a cast_frozen_weights (bf16) model the fold
                # must not silently promote the kernel back to fp32 — and
                # the apply path computes the LoRA delta in the activation
                # dtype anyway.
                bp["kernel"] = bp["kernel"] + (
                    alpha * delta * adapted
                ).astype(bp["kernel"].dtype)
                bp["lora_A"] = jnp.zeros_like(bp["lora_A"])
                bp["lora_B"] = jnp.zeros_like(bp["lora_B"])
                blocks[lin] = bp
        return blocks

    backbone = dict(params["backbone"])
    if cfg.backbone.ffn_type == "moe":
        # Split layout (vit.py moe_boundary): the dense prefix is never
        # adapted (factors are zero by construction — folding with a zero
        # mask just zeroes them for the serving contract); every block of
        # the MoE suffix is adapted.
        if "blocks" in backbone:
            backbone["blocks"] = fold_stack(backbone["blocks"], 0.0)
        backbone["moe_blocks"] = fold_stack(backbone["moe_blocks"], 1.0)
    else:
        adapted = jnp.zeros((depth, 1, 1)).at[first:].set(1.0)
        backbone["blocks"] = fold_stack(backbone["blocks"], adapted)
    return {**params, "backbone": backbone}


def cast_frozen_weights(params: Params, cfg: DetectorConfig,
                        dtype=jnp.bfloat16) -> Params:
    """Store the frozen backbone GEMM weights in the compute dtype.

    The forward casts weights to the activation dtype anyway, so this is
    numerically identical — it just removes the per-step fp32->bf16
    conversions and halves the frozen weights' HBM traffic. Trainable
    leaves (LoRA, projection, decoder) and the tiny LayerNorm/LayerScale
    vectors stay fp32 (optimizer precision / fp32 LN statistics).
    """
    def cast_stack(blocks):
        blocks = {k: (dict(v) if isinstance(v, dict) else v)
                  for k, v in blocks.items()}
        for lin in ("q", "k", "v", "proj", "fc1", "fc2"):
            if lin not in blocks:  # MoE blocks have no dense fc1/fc2;
                continue  # their expert weights are trainable -> fp32
            bp = dict(blocks[lin])
            bp["kernel"] = bp["kernel"].astype(dtype)
            bp["bias"] = bp["bias"].astype(dtype)
            blocks[lin] = bp
        return blocks

    backbone = dict(params["backbone"])
    if "blocks" in backbone:
        backbone["blocks"] = cast_stack(backbone["blocks"])
    if "moe_blocks" in backbone:
        # MoE suffix: the attention bases (q/k/v/proj) are frozen like
        # everywhere else and cast; experts/router stay fp32 (trainable).
        backbone["moe_blocks"] = cast_stack(backbone["moe_blocks"])
    backbone["patch_embed"] = {
        "kernel": backbone["patch_embed"]["kernel"].astype(dtype),
        "bias": backbone["patch_embed"]["bias"].astype(dtype),
    }
    backbone["cls_token"] = backbone["cls_token"].astype(dtype)
    backbone["pos_embed"] = backbone["pos_embed"].astype(dtype)
    return {**params, "backbone": backbone}


def count_params(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def count_trainable_params(params: Params, cfg: DetectorConfig) -> int:
    """Number of *effectively* trainable parameters (LoRA counted only for
    adapted blocks), comparable to the reference's requires_grad count."""
    mask = trainable_mask(params, cfg)
    mult = lora_block_multiplier(params, cfg)

    def count(leaf, m, f):
        if not m:
            return 0
        frac = float(jnp.mean(jnp.broadcast_to(f, leaf.shape) > 0))
        return int(leaf.size * frac)

    counts = jax.tree_util.tree_map(count, params, mask, mult)
    return sum(jax.tree_util.tree_leaves(counts))
