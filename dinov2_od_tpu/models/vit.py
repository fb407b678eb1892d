"""DINOv2 ViT backbone with LoRA adapters, as pure JAX functions.

Capability-equivalent to the reference's frozen HF `Dinov2Model` wrapped
with LoRA on the last 2 encoder blocks
(dino_detector/models/dinov2_backbone.py), rebuilt TPU-first:

- Patch embed as `lax.conv_general_dilated` (NHWC) — lowers straight onto
  the MXU.
- Pre-norm blocks with LayerScale, fused over depth with `lax.scan` on
  stacked per-block params (one compiled block body regardless of depth).
- Attention through `ops.attention.multi_head_attention` (Pallas flash
  kernel on TPU, XLA fallback elsewhere).
- Every linear in every block carries LoRA (A, B) factors so the scan body
  is uniform; which blocks actually *train* their adapters is decided by an
  optimizer mask (see models.detector.trainable_mask), reproducing the
  reference's "last 2 blocks only" placement (dinov2_backbone.py:45-51).
- Optional trainable projection to the decoder dim (dinov2_backbone.py:
  33-37).

Weights are importable from HF PyTorch checkpoints via
models.import_torch.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import BackboneConfig
from ..ops.attention import multi_head_attention
from .layers import (
    layer_norm,
    layernorm_init,
    linear,
    lora_init,
    lora_linear,
    torch_linear_init,
    trunc_normal_init,
)

Params = Dict[str, Any]


def _init_block(rng: jax.Array, cfg: BackboneConfig, moe: bool = False) -> Params:
    d, m, r = cfg.hidden_dim, cfg.mlp_dim, cfg.lora_r
    keys = jax.random.split(rng, 12)
    fc1_out = 2 * m if cfg.ffn_type == "swiglu" else m

    def adapted(key, i, o):
        kw, kl = jax.random.split(key)
        p = torch_linear_init(kw, i, o)
        p.update(lora_init(kl, i, o, r))
        return p

    block = {
        "ln1": layernorm_init(d),
        "q": adapted(keys[0], d, d),
        "k": adapted(keys[1], d, d),
        "v": adapted(keys[2], d, d),
        "proj": adapted(keys[3], d, d),
        "ls1": jnp.full((d,), cfg.layerscale_init, jnp.float32),
        "ln2": layernorm_init(d),
        "ls2": jnp.full((d,), cfg.layerscale_init, jnp.float32),
    }
    if moe:
        # MoE FFN (ops/moe.py — beyond reference): per-expert dense FFN
        # weights stacked on a leading E axis (shards over the model
        # axis for expert parallelism) + a replicated router. No LoRA on
        # experts: there is no pretrained MoE DINOv2 to adapt — expert/
        # router weights ARE the trainable capacity (see trainable_mask).
        e = cfg.moe_num_experts
        ks = jax.random.split(keys[4], 2 * e + 1)
        fc1s = [torch_linear_init(ks[i], d, m) for i in range(e)]
        fc2s = [torch_linear_init(ks[e + i], m, d) for i in range(e)]
        block["moe"] = {
            "router_kernel": trunc_normal_init(ks[-1], (d, e)),
            "fc1_kernel": jnp.stack([p["kernel"] for p in fc1s]),
            "fc1_bias": jnp.stack([p["bias"] for p in fc1s]),
            "fc2_kernel": jnp.stack([p["kernel"] for p in fc2s]),
            "fc2_bias": jnp.stack([p["bias"] for p in fc2s]),
        }
    else:
        block["fc1"] = adapted(keys[4], d, fc1_out)
        block["fc2"] = adapted(keys[5], m, d)
    return block


def moe_boundary(cfg: BackboneConfig) -> int:
    """First MoE block index under ffn_type == 'moe' (sparse-upcycling
    layout): the frozen prefix keeps the dense FFN — that is where
    pretrained DINOv2 weights load and where prefix_int8 applies — and
    the adapted last `lora_last_n_blocks` swap in the MoE FFN (the new
    trainable capacity). lora_last_n_blocks = depth gives full-depth MoE.
    """
    if cfg.lora_last_n_blocks <= 0:
        raise ValueError(
            "ffn_type='moe' requires lora_last_n_blocks > 0 (MoE lives in "
            "the adapted blocks; set lora_last_n_blocks = depth for "
            "full-depth MoE)"
        )
    return max(0, cfg.depth - cfg.lora_last_n_blocks)


def init_backbone_params(rng: jax.Array, cfg: BackboneConfig) -> Params:
    keys = jax.random.split(rng, cfg.depth + 4)
    d = cfg.hidden_dim

    k = moe_boundary(cfg) if cfg.ffn_type == "moe" else cfg.depth
    blocks = [_init_block(keys[i], cfg, moe=(i >= k)) for i in range(cfg.depth)]

    def stack(bs):
        # Stack per-block params along a leading depth axis for lax.scan.
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *bs)

    params: Params = {
        "patch_embed": {
            "kernel": trunc_normal_init(
                keys[-4], (cfg.patch_size, cfg.patch_size, 3, d)
            ),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "cls_token": trunc_normal_init(keys[-3], (1, 1, d)),
        "pos_embed": trunc_normal_init(keys[-2], (1, cfg.seq_len, d)),
        "ln_f": layernorm_init(d),
    }
    if k > 0:
        params["blocks"] = stack(blocks[:k])
    if k < cfg.depth:
        params["moe_blocks"] = stack(blocks[k:])
    if cfg.target_dim is not None and cfg.target_dim != d:
        params["projection"] = torch_linear_init(keys[-1], d, cfg.target_dim)
    return params


def _eff_kernel(p: Params, alpha: float, dtype, mode: str):
    """Effective weight: folded (W + alpha*A@B, one GEMM downstream) or the
    raw base kernel (caller adds the factored rank-r path)."""
    w = p["kernel"]
    if mode == "fold" and "lora_A" in p:
        w = w + alpha * (p["lora_A"] @ p["lora_B"])
    return w.astype(dtype)


def _attention(
    x: jnp.ndarray, bp: Params, cfg: BackboneConfig, attn_impl: str,
    mesh=None, seq_axis=None, valid_len=None, lora_active=True,
    batch_axis=None, tp_axis=None,
):
    b, n, d = x.shape
    h = cfg.num_heads
    dh = d // h
    alpha = cfg.lora_alpha
    mode = cfg.lora_mode if lora_active else "skip"

    if "kernel_q" in bp["q"]:
        # int8 serving params: fused q/k/v as one s8xs8->s32 MXU GEMM
        # (models/quantize.py). LoRA is already folded by contract.
        from .quantize import int8_qkv

        qkv = int8_qkv(x, bp)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh)
        k = k.reshape(b, n, h, dh)
        v = v.reshape(b, n, h, dh)
        out = multi_head_attention(
            q, k, v, impl=attn_impl, mesh=mesh, seq_axis=seq_axis,
            batch_axis=batch_axis, tp_axis=tp_axis, kv_valid_len=valid_len,
        ).reshape(b, n, d)
        return _maybe_lora(out, bp["proj"], cfg, lora_active)

    # One fused [D, 3D] GEMM for q/k/v (the concat is a cheap on-chip copy;
    # three separate skinny GEMMs measurably underutilize the MXU).
    w_qkv = jnp.concatenate(
        [_eff_kernel(bp[p], alpha, x.dtype, mode) for p in ("q", "k", "v")],
        axis=1,
    )
    b_qkv = jnp.concatenate(
        [bp["q"]["bias"], bp["k"]["bias"], bp["v"]["bias"]]
    ).astype(x.dtype)
    qkv = x @ w_qkv + b_qkv
    if mode not in ("fold", "skip") and "lora_A" in bp["q"]:
        # Fused LoRA: x @ [A_q|A_k|A_v], then ONE [3r, 3D] block-diagonal
        # B GEMM straight into the qkv add. Materializing the three
        # [B, N, D] deltas and concatenating them cost 0.39 ms x depth
        # per step at ViT-L/518 (trace: maximum_add_fusion); the single
        # GEMM's epilogue fuses into the add instead.
        a_qkv = jnp.concatenate(
            [bp["q"]["lora_A"], bp["k"]["lora_A"], bp["v"]["lora_A"]], axis=1
        ).astype(x.dtype)
        xa = x @ a_qkv  # [B, N, 3r]
        r = bp["q"]["lora_A"].shape[-1]
        b_diag = jnp.zeros((3 * r, 3 * d), x.dtype)
        for i, p in enumerate(("q", "k", "v")):
            b_diag = jax.lax.dynamic_update_slice(
                b_diag, bp[p]["lora_B"].astype(x.dtype), (i * r, i * d)
            )
        qkv = qkv + alpha * (xa @ b_diag)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, n, h, dh)
    k = k.reshape(b, n, h, dh)
    v = v.reshape(b, n, h, dh)
    out = multi_head_attention(
        q, k, v, impl=attn_impl, mesh=mesh, seq_axis=seq_axis,
        batch_axis=batch_axis, tp_axis=tp_axis, kv_valid_len=valid_len,
    ).reshape(b, n, d)
    return _maybe_lora(out, bp["proj"], cfg, lora_active)


def _maybe_lora(
    x: jnp.ndarray, p: Params, cfg: BackboneConfig, active: bool = True
) -> jnp.ndarray:
    if "kernel_q" in p:  # int8 serving params (LoRA folded by contract)
        return linear(x, p)
    if not active:
        return linear(x, p)
    if cfg.lora_mode == "fold" and "lora_A" in p:
        w = _eff_kernel(p, cfg.lora_alpha, x.dtype, "fold")
        return x @ w + p["bias"].astype(x.dtype)
    return lora_linear(x, p, cfg.lora_alpha)


def _ffn(x: jnp.ndarray, bp: Params, cfg: BackboneConfig, lora_active=True):
    h = _maybe_lora(x, bp["fc1"], cfg, lora_active)
    if cfg.ffn_type == "swiglu":
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(x1) * x2
    else:
        h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
    return _maybe_lora(h, bp["fc2"], cfg, lora_active)


def _block_apply(
    x: jnp.ndarray, bp: Params, cfg: BackboneConfig, attn_impl: str,
    mesh=None, seq_axis=None, valid_len=None, lora_active=True,
    batch_axis=None, tp_axis=None,
):
    """Pre-norm ViT block with LayerScale (HF Dinov2Layer semantics)."""
    x = x + bp["ls1"].astype(x.dtype) * _attention(
        layer_norm(x, bp["ln1"]), bp, cfg, attn_impl, mesh, seq_axis,
        valid_len, lora_active, batch_axis, tp_axis,
    )
    x = x + bp["ls2"].astype(x.dtype) * _ffn(
        layer_norm(x, bp["ln2"]), bp, cfg, lora_active
    )
    return x


def _block_apply_moe(
    x: jnp.ndarray, bp: Params, cfg: BackboneConfig, attn_impl: str,
    mesh=None, seq_axis=None, valid_len=None, lora_active=True,
    batch_axis=None, tp_axis=None,
):
    """Pre-norm block with an MoE FFN (ops/moe.py). Returns (x, aux):
    the router load-balance loss accumulates over depth in the scan
    carry. Expert parallelism rides the model axis (ep = tp_axis)."""
    from ..ops.moe import moe_ffn

    x = x + bp["ls1"].astype(x.dtype) * _attention(
        layer_norm(x, bp["ln1"]), bp, cfg, attn_impl, mesh, seq_axis,
        valid_len, lora_active, batch_axis, tp_axis,
    )
    act = (lambda h: jax.nn.gelu(h, approximate=cfg.gelu_approximate))
    ffn_out, aux = moe_ffn(
        layer_norm(x, bp["ln2"]),
        bp["moe"],
        top_k=cfg.moe_top_k,
        capacity_factor=cfg.moe_capacity_factor,
        activation=act,
        mesh=mesh,
        ep_axis=tp_axis,
        data_axis=batch_axis,
    )
    x = x + bp["ls2"].astype(x.dtype) * ffn_out
    return x, aux


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, src_grid: int, dst_grid: int
) -> jnp.ndarray:
    """Bicubic-resample patch position embeddings to a new grid (the CLS
    position is passed through). Used by the HF importer when the target
    image size differs from the checkpoint's native 518px/37x37 grid."""
    if src_grid == dst_grid:
        return pos_embed
    cls_pos, patch_pos = pos_embed[:, :1], pos_embed[:, 1:]
    d = patch_pos.shape[-1]
    grid = patch_pos.reshape(1, src_grid, src_grid, d)
    resized = jax.image.resize(
        grid, (1, dst_grid, dst_grid, d), method="bicubic"
    )
    return jnp.concatenate(
        [cls_pos, resized.reshape(1, dst_grid * dst_grid, d)], axis=1
    )


def backbone_apply(
    params: Params,
    cfg: BackboneConfig,
    pixel_values: jnp.ndarray,
    *,
    attn_impl: str = "auto",
    use_remat: bool = False,
    mesh=None,
    seq_axis: str | None = None,
    batch_axis: str | None = None,
    tp_axis: str | None = None,
    pipe_axis: str | None = None,
    pipe_microbatches: int = 0,
    pipe_chunks: int = 1,
) -> jnp.ndarray:
    """Run the backbone.

    Args:
      pixel_values: [B, H, W, 3] float images (NHWC — TPU-native layout;
        the data pipeline emits this directly).

    Returns:
      [B, seq, out_dim] features; seq = patches (+1 CLS unless
      cfg.drop_cls_token). Final LayerNorm applied (HF last_hidden_state
      semantics, dinov2_backbone.py:61); optional projection to target_dim
      (dinov2_backbone.py:64-65).

      When cfg.ffn_type == "moe", returns (features, moe_aux) instead:
      the depth-mean router load-balance loss (scalar fp32) rides along
      for the training objective (ops/moe.py).
    """
    dtype = jnp.dtype(cfg.dtype)
    x = pixel_values.astype(dtype)

    # Patchify as reshape + GEMM: with stride == kernel size the conv is an
    # exact non-overlapping patch matmul, and XLA's conv lowering for
    # 14x14/s14 measures ~7x slower than the plain GEMM on v5e (trace:
    # convolution_add_fusion 7.3ms/step at ViT-B batch 32).
    b, hh, ww, c = x.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    x = x.reshape(b, gh, p, gw, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, gh * gw, p * p * c)
    kernel = params["patch_embed"]["kernel"].astype(dtype).reshape(
        p * p * c, cfg.hidden_dim
    )
    x = x @ kernel + params["patch_embed"]["bias"].astype(dtype)

    cls = jnp.broadcast_to(
        params["cls_token"].astype(dtype), (b, 1, cfg.hidden_dim)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(dtype)

    # Pad the token dim ONCE to the attention kernel's sublane multiple
    # (e.g. 257 -> 272) instead of padding q/k/v inside every block's
    # attention call — measured 1.4 ms/step of HBM pads at ViT-B batch 32.
    # Padded rows are zeros; they are masked out as attention keys
    # (kv_valid_len) and sliced off before the final norm, and their
    # cotangents are zero, so forward AND gradients are exact.
    seq = x.shape[1]
    from ..ops.attention import seq_pad_multiple

    # Under ring/pipeline parallelism the shard_map handles its own
    # padding; single-device and TP keep the once-at-embedding pad.
    mult = 1 if (mesh is not None and tp_axis is None) else seq_pad_multiple(
        seq, cfg.hidden_dim // cfg.num_heads, attn_impl
    )
    s_pad = ((seq + mult - 1) // mult) * mult
    valid_len = seq if s_pad != seq else None
    if s_pad != seq:
        x = jnp.pad(x, ((0, 0), (0, s_pad - seq), (0, 0)))

    def make_block_fn(lora_active, mesh_=mesh, batch_axis_=batch_axis):
        fn = lambda carry, bp: (
            _block_apply(
                carry, bp, cfg, attn_impl, mesh_, seq_axis, valid_len,
                lora_active, batch_axis_, tp_axis,
            ),
            None,
        )
        return jax.checkpoint(fn) if use_remat else fn

    block_fn = make_block_fn(True)

    def run_blocks(x, blocks, length, fn):
        unroll = min(cfg.scan_unroll, length) if cfg.scan_unroll > 0 else length
        x, _ = jax.lax.scan(fn, x, blocks, unroll=unroll)
        return x

    if cfg.ffn_type == "moe":
        # Sparse-upcycling layout (Komatsuzaki et al. 2023 shape): the
        # frozen prefix keeps its DENSE FFN (params["blocks"] — where
        # pretrained DINOv2 weights load and where prefix_int8 applies,
        # exactly as in the dense path), and the adapted suffix swaps in
        # the MoE FFN (params["moe_blocks"]). Expert params/grads/Adam
        # moments therefore scale with lora_last_n_blocks, not depth.
        # The suffix scan's carry additionally accumulates the router
        # load-balance aux loss. Pipeline parallelism is not supported
        # (its block body has no aux channel) — EP composes with DP/TP.
        if pipe_axis is not None:
            raise ValueError(
                "ffn_type='moe' is not supported under pipeline "
                "parallelism; shard experts over the model axis (EP) "
                "instead"
            )
        k = moe_boundary(cfg)
        if k > 0:
            prefix = jax.tree_util.tree_map(
                jax.lax.stop_gradient, params["blocks"]
            )
            if cfg.prefix_int8:
                from .quantize import quantize_linear

                prefix = {
                    name: (
                        quantize_linear(sub)
                        if name in ("q", "k", "v", "proj", "fc1", "fc2")
                        else sub
                    )
                    for name, sub in prefix.items()
                }
            x = run_blocks(x, prefix, k, make_block_fn(False))

        def moe_fn(carry, bp):
            h, aux = carry
            h, aux_b = _block_apply_moe(
                h, bp, cfg, attn_impl, mesh, seq_axis, valid_len,
                True, batch_axis, tp_axis,
            )
            return (h, aux + aux_b), None

        fn = jax.checkpoint(moe_fn) if use_remat else moe_fn
        n_moe = cfg.depth - k
        unroll = min(cfg.scan_unroll, n_moe) if cfg.scan_unroll > 0 else n_moe
        (x, moe_aux), _ = jax.lax.scan(
            fn, (x, jnp.zeros((), jnp.float32)), params["moe_blocks"],
            unroll=unroll,
        )
        if s_pad != seq:
            x = x[:, :seq]
        x = layer_norm(x, params["ln_f"])
        if "projection" in params:
            x = linear(x, params["projection"])
        if cfg.drop_cls_token:
            x = x[:, 1:]
        return x, moe_aux / n_moe

    # Split the depth scan at the LoRA boundary: blocks below the last
    # `lora_last_n_blocks` have NO trainable parameters (base weights are
    # frozen, their LoRA factors never receive updates — the reference only
    # adapts the last N blocks, dinov2_backbone.py:45-51), so their entire
    # subtree is stop-gradiented. JAX then emits no backward ops for the
    # prefix at trace time — the cotangent chain starts at the first adapted
    # block, exactly like torch autograd with requires_grad=False — which
    # removes ~(depth-N)/depth of the backbone backward GEMMs, attention
    # backward, and (under remat) forward recomputation.
    k = max(0, cfg.depth - cfg.lora_last_n_blocks)
    if pipe_axis is not None:
        if cfg.prefix_int8:
            # The pipeline branch streams the WHOLE depth stack through
            # one uniform block body (no prefix/suffix split), so the
            # frozen-prefix quantization cannot apply — fail loudly
            # instead of silently running bf16.
            raise ValueError(
                "prefix_int8 is not supported under pipeline parallelism "
                "(the depth stack is not split at the LoRA boundary there)"
            )
        # Pipeline parallelism: the depth stack streams over the mesh
        # axis GPipe-style. The LoRA-boundary split is expressed by
        # stop-gradienting the prefix entries of the stacked leaves
        # (same cotangent cut, pipeline-compatible).
        from ..parallel.pipeline import pipeline_blocks

        blocks = params["blocks"]
        if 0 < k < cfg.depth:
            blocks = jax.tree_util.tree_map(
                lambda a: jnp.concatenate(
                    [jax.lax.stop_gradient(a[:k]), a[k:]]
                ),
                blocks,
            )
        pipe_block_fn = block_fn
        auto_axes = ()
        if tp_axis is not None:
            # PP x TP: the pipeline's shard_map goes manual over
            # (data, stage) and leaves the TP axis AUTO. Inside that
            # region the attention shard_map must bind the CONTEXT mesh
            # (mesh=None) and the batch is already manual-local
            # (batch_axis=None) — its in_specs may only name the auto
            # 'model' axis.
            pipe_block_fn = make_block_fn(True, mesh_=None, batch_axis_=None)
            auto_axes = (tp_axis,)
        x = pipeline_blocks(
            x, blocks, pipe_block_fn, mesh, pipe_axis, pipe_microbatches,
            num_chunks=pipe_chunks, auto_axes=auto_axes,
        )
    elif 0 < k < cfg.depth:
        # The prefix also skips the LoRA compute entirely: non-adapted
        # blocks' factors are zero by construction (B zero-init +
        # per-block masked updates, models/detector.py), so their delta
        # GEMMs and [*, 3D]-wide adds are pure waste — measured ~0.4
        # ms/block/step at ViT-L/518.
        prefix = jax.tree_util.tree_map(
            lambda a: jax.lax.stop_gradient(a[:k]), params["blocks"]
        )
        suffix = jax.tree_util.tree_map(lambda a: a[k:], params["blocks"])
        if cfg.prefix_int8:
            # The stop-gradiented prefix forward is pure inference, so
            # the W8A8 serving scheme applies during TRAINING. Weights
            # quantize here in-graph (stacked [k, i, o] leaves; ~0.2 ms
            # at ViT-B — far less than the int8 GEMM saving); the block
            # body dispatches on kernel_q like the serving path.
            from .quantize import quantize_linear

            prefix = {
                name: (
                    quantize_linear(sub)
                    if name in ("q", "k", "v", "proj", "fc1", "fc2")
                    else sub
                )
                for name, sub in prefix.items()
            }
        x = run_blocks(x, prefix, k, make_block_fn(False))
        x = run_blocks(x, suffix, cfg.depth - k, block_fn)
    else:
        x = run_blocks(
            x, params["blocks"], cfg.depth,
            make_block_fn(cfg.lora_last_n_blocks > 0),
        )

    if s_pad != seq:
        x = x[:, :seq]
    x = layer_norm(x, params["ln_f"])

    if "projection" in params:
        x = linear(x, params["projection"])

    if cfg.drop_cls_token:
        # Fix of reference quirk (SURVEY.md §7.5): keeping CLS makes seq_len
        # prime (e.g. 257) and degenerates deformable sampling to 1-D.
        x = x[:, 1:]
    return x
