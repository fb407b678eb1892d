"""Import a FULL reference checkpoint (DINOv2ObjectDetector state_dict)
into this framework's params — the trained-model migration path for users
switching from the PyTorch reference.

Handles the reference's exact state-dict layout (dino_detector/models/*):

- `backbone.dino.*`: HF Dinov2 keys, except LoRA-wrapped blocks where each
  Linear became LoraLinear (utils.py:46-70): `X.weight` -> `X.linear.weight`
  plus `X.lora_A.weight` [r, in] and `X.lora_B.weight` [out, r].
- `backbone.projection.*`: optional projection head.
- `decoder.query_embed.weight`, `decoder.class_embed.*`,
  `decoder.bbox_embed.mlp.{0,2}.*`.
- Standard path: torch nn.TransformerDecoder layers with packed
  `self_attn.in_proj_weight` [3D, D] and `multihead_attn.*`.
- Deformable path: per-layer self_attn (packed), reference_points_proj,
  cross_attn.{sampling_offsets,attention_weights,value_proj,output_proj}.
  The reference ties all deformable layers to one instance
  (deformable_attention.py:284), so every layers.{i}.* entry carries the
  same tensors; import with DecoderConfig(tie_layer_weights=True) for
  bit-parity, or untied (each layer still receives those values).

Forward parity with the actual reference model is validated in
tests/test_import_reference.py (both attention paths, keep-CLS config).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DetectorConfig
from .import_torch import _load_state_dict, load_dinov2_backbone_params

Params = Dict[str, Any]


def _unwrap_lora_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Flatten LoraLinear wrapper keys back to plain Linear keys, pulling
    the factors out under synthetic '<name>#lora_A/B' keys."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(".linear.weight"):
            out[k.replace(".linear.weight", ".weight")] = v
        elif k.endswith(".linear.bias"):
            out[k.replace(".linear.bias", ".bias")] = v
        elif k.endswith(".lora_A.weight"):
            out[k.replace(".lora_A.weight", "#lora_A")] = v
        elif k.endswith(".lora_B.weight"):
            out[k.replace(".lora_B.weight", "#lora_B")] = v
        else:
            out[k] = v
    return out


_HF_BLOCK_LINEARS = {
    "q": "attention.attention.query",
    "k": "attention.attention.key",
    "v": "attention.attention.value",
    "proj": "attention.output.dense",
    "fc1": "mlp.fc1",
    "fc2": "mlp.fc2",
}


def load_reference_detector_params(
    checkpoint, cfg: DetectorConfig, template: Params
) -> Params:
    """Map a reference DINOv2ObjectDetector state dict onto our pytree."""
    sd = _load_state_dict(checkpoint)
    # The reference trainer may prefix with 'module.' (DDP; train.py:700).
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items() if k.startswith("module.")}
    sd = _unwrap_lora_keys(sd)

    backbone_sd = {
        k[len("backbone.dino."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.dino.") and "#lora" not in k
    }
    params: Params = {
        "backbone": load_dinov2_backbone_params(
            backbone_sd, cfg.backbone, template["backbone"]
        )
    }

    # LoRA factors from the wrapped blocks (torch [r,in]/[out,r] -> ours
    # [in,r]/[r,out]); blocks without adapters keep the template zeros...
    # actually keep ZERO factors so the imported forward equals the torch
    # model exactly even where the template had random A.
    blocks = {
        k: (dict(v) if isinstance(v, dict) else v)
        for k, v in params["backbone"]["blocks"].items()
    }
    depth = cfg.backbone.depth
    for ours, hf in _HF_BLOCK_LINEARS.items():
        bp = blocks[ours]
        if "lora_A" not in bp:
            continue
        r = bp["lora_A"].shape[-1]
        A = np.zeros((depth,) + bp["lora_A"].shape[1:], np.float32)
        B = np.zeros((depth,) + bp["lora_B"].shape[1:], np.float32)
        for i in range(depth):
            ka = f"backbone.dino.encoder.layer.{i}.{hf}#lora_A"
            kb = f"backbone.dino.encoder.layer.{i}.{hf}#lora_B"
            if ka in sd:
                A[i] = np.asarray(sd[ka]).T  # [r,in] -> [in,r]
                B[i] = np.asarray(sd[kb]).T  # [out,r] -> [r,out]
        bp["lora_A"] = jnp.asarray(A)
        bp["lora_B"] = jnp.asarray(B)
        blocks[ours] = bp
    params["backbone"]["blocks"] = blocks

    if "backbone.projection.weight" in sd and "projection" in template["backbone"]:
        params["backbone"]["projection"] = {
            "kernel": jnp.asarray(sd["backbone.projection.weight"]).T,
            "bias": jnp.asarray(sd["backbone.projection.bias"]),
        }

    # ------------------------------------------------------------------
    # Decoder
    # ------------------------------------------------------------------
    t = lambda k: jnp.asarray(sd[k]).T
    a = lambda k: jnp.asarray(sd[k])
    dec: Params = {
        "query_embed": a("decoder.query_embed.weight"),
        "class_embed": {
            "kernel": t("decoder.class_embed.weight"),
            "bias": a("decoder.class_embed.bias"),
        },
        "bbox_mlp": {
            "fc1": {"kernel": t("decoder.bbox_embed.mlp.0.weight"),
                    "bias": a("decoder.bbox_embed.mlp.0.bias")},
            "fc2": {"kernel": t("decoder.bbox_embed.mlp.2.weight"),
                    "bias": a("decoder.bbox_embed.mlp.2.bias")},
        },
    }

    def packed_attention(prefix: str) -> Params:
        """torch MultiheadAttention: in_proj [3D, D] packed q/k/v."""
        w = np.asarray(sd[prefix + ".in_proj_weight"])
        b = np.asarray(sd[prefix + ".in_proj_bias"])
        d = w.shape[1]
        wq, wk, wv = w[:d], w[d : 2 * d], w[2 * d :]
        bq, bk, bv = b[:d], b[d : 2 * d], b[2 * d :]
        return {
            "q": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
            "k": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
            "v": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
            "out": {"kernel": t(prefix + ".out_proj.weight"),
                    "bias": a(prefix + ".out_proj.bias")},
        }

    layers = []
    for i in range(cfg.decoder.num_layers):
        pre = f"decoder.decoder.layers.{i}."
        lp: Params = {
            "self_attn": packed_attention(pre + "self_attn"),
            "ln1": {"scale": a(pre + "norm1.weight"), "bias": a(pre + "norm1.bias")},
            "ln2": {"scale": a(pre + "norm2.weight"), "bias": a(pre + "norm2.bias")},
            "ln3": {"scale": a(pre + "norm3.weight"), "bias": a(pre + "norm3.bias")},
            "fc1": {"kernel": t(pre + "linear1.weight"), "bias": a(pre + "linear1.bias")},
            "fc2": {"kernel": t(pre + "linear2.weight"), "bias": a(pre + "linear2.bias")},
        }
        if cfg.decoder.use_deformable:
            lp["ref_proj"] = {
                "kernel": t(pre + "reference_points_proj.weight"),
                "bias": a(pre + "reference_points_proj.bias"),
            }
            lp["deform"] = {
                "offsets_kernel": t(pre + "cross_attn.sampling_offsets.weight"),
                "offsets_bias": a(pre + "cross_attn.sampling_offsets.bias"),
                "weights_kernel": t(pre + "cross_attn.attention_weights.weight"),
                "weights_bias": a(pre + "cross_attn.attention_weights.bias"),
                "value_kernel": t(pre + "cross_attn.value_proj.weight"),
                "value_bias": a(pre + "cross_attn.value_proj.bias"),
                "output_kernel": t(pre + "cross_attn.output_proj.weight"),
                "output_bias": a(pre + "cross_attn.output_proj.bias"),
            }
        else:
            lp["cross_attn"] = packed_attention(pre + "multihead_attn")
        layers.append(lp)

    dec["layers"] = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    params["decoder"] = dec
    return params
