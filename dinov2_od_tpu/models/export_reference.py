"""Export our detector params to the PyTorch reference's state-dict format
(the inverse of models/import_reference.py).

Lets users trained on TPU hand a checkpoint back to the reference
implementation (dino_detector) — or to any torch tooling that consumes its
layout: HF Dinov2 backbone keys under `backbone.dino.*` with
LoraLinear-wrapped adapted blocks, `backbone.projection.*`, and the
DETRDecoder layout (packed torch MultiheadAttention in_proj, bbox MLP as
`bbox_embed.mlp.{0,2}`).

Round-trip (export -> import_reference) is validated to reproduce the
original params exactly in tests/test_export_reference.py.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import DetectorConfig

Params = Dict[str, Any]

_HF_BLOCK_LINEARS = {
    "q": "attention.attention.query",
    "k": "attention.attention.key",
    "v": "attention.attention.value",
    "proj": "attention.output.dense",
    "fc1": "mlp.fc1",
    "fc2": "mlp.fc2",
}


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_reference_state_dict(params: Params, cfg: DetectorConfig) -> Dict[str, np.ndarray]:
    """Build a reference-format state dict (numpy arrays; wrap with
    torch.from_numpy for torch.save)."""
    sd: Dict[str, np.ndarray] = {}
    bb = params["backbone"]
    depth = cfg.backbone.depth
    adapted_from = max(0, depth - cfg.backbone.lora_last_n_blocks)

    # Embeddings (HWIO -> OIHW).
    sd["backbone.dino.embeddings.patch_embeddings.projection.weight"] = (
        _np(bb["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    )
    sd["backbone.dino.embeddings.patch_embeddings.projection.bias"] = _np(
        bb["patch_embed"]["bias"]
    )
    sd["backbone.dino.embeddings.cls_token"] = _np(bb["cls_token"])
    sd["backbone.dino.embeddings.position_embeddings"] = _np(bb["pos_embed"])
    # HF checkpoints carry a mask_token the reference never uses.
    sd["backbone.dino.embeddings.mask_token"] = np.zeros(
        (1, cfg.backbone.hidden_dim), np.float32
    )

    blocks = bb["blocks"]
    for i in range(depth):
        pre = f"backbone.dino.encoder.layer.{i}."
        adapted = i >= adapted_from
        for ours, hf in _HF_BLOCK_LINEARS.items():
            bp = blocks[ours]
            w = _np(bp["kernel"][i]).T  # [in,out] -> torch [out,in]
            b = _np(bp["bias"][i])
            if adapted and "lora_A" in bp:
                # LoraLinear wrapper layout (reference utils.py:46-70).
                sd[pre + hf + ".linear.weight"] = w
                sd[pre + hf + ".linear.bias"] = b
                sd[pre + hf + ".lora_A.weight"] = _np(bp["lora_A"][i]).T
                sd[pre + hf + ".lora_B.weight"] = _np(bp["lora_B"][i]).T
            else:
                sd[pre + hf + ".weight"] = w
                sd[pre + hf + ".bias"] = b
        sd[pre + "norm1.weight"] = _np(blocks["ln1"]["scale"][i])
        sd[pre + "norm1.bias"] = _np(blocks["ln1"]["bias"][i])
        sd[pre + "norm2.weight"] = _np(blocks["ln2"]["scale"][i])
        sd[pre + "norm2.bias"] = _np(blocks["ln2"]["bias"][i])
        sd[pre + "layer_scale1.lambda1"] = _np(blocks["ls1"][i])
        sd[pre + "layer_scale2.lambda1"] = _np(blocks["ls2"][i])
    sd["backbone.dino.layernorm.weight"] = _np(bb["ln_f"]["scale"])
    sd["backbone.dino.layernorm.bias"] = _np(bb["ln_f"]["bias"])

    if "projection" in bb:
        sd["backbone.projection.weight"] = _np(bb["projection"]["kernel"]).T
        sd["backbone.projection.bias"] = _np(bb["projection"]["bias"])

    dec = params["decoder"]
    sd["decoder.query_embed.weight"] = _np(dec["query_embed"])
    sd["decoder.class_embed.weight"] = _np(dec["class_embed"]["kernel"]).T
    sd["decoder.class_embed.bias"] = _np(dec["class_embed"]["bias"])
    sd["decoder.bbox_embed.mlp.0.weight"] = _np(dec["bbox_mlp"]["fc1"]["kernel"]).T
    sd["decoder.bbox_embed.mlp.0.bias"] = _np(dec["bbox_mlp"]["fc1"]["bias"])
    sd["decoder.bbox_embed.mlp.2.weight"] = _np(dec["bbox_mlp"]["fc2"]["kernel"]).T
    sd["decoder.bbox_embed.mlp.2.bias"] = _np(dec["bbox_mlp"]["fc2"]["bias"])

    if cfg.decoder.use_deformable:
        # The reference DETRDecoder declares an unused decoder-level
        # reference_points Linear (dead code; detr_decoder.py:44-45,
        # SURVEY.md §7.6). Emit zeros so strict state-dict loads succeed.
        d = cfg.decoder.hidden_dim
        sd["decoder.reference_points.weight"] = np.zeros((2, d), np.float32)
        sd["decoder.reference_points.bias"] = np.zeros((2,), np.float32)

    layers = dec["layers"]
    for i in range(cfg.decoder.num_layers):
        pre = f"decoder.decoder.layers.{i}."
        sa = layers["self_attn"]
        sd[pre + "self_attn.in_proj_weight"] = np.concatenate(
            [_np(sa[p]["kernel"][i]).T for p in ("q", "k", "v")], axis=0
        )
        sd[pre + "self_attn.in_proj_bias"] = np.concatenate(
            [_np(sa[p]["bias"][i]) for p in ("q", "k", "v")]
        )
        sd[pre + "self_attn.out_proj.weight"] = _np(sa["out"]["kernel"][i]).T
        sd[pre + "self_attn.out_proj.bias"] = _np(sa["out"]["bias"][i])
        for ln, torch_ln in (("ln1", "norm1"), ("ln2", "norm2"), ("ln3", "norm3")):
            sd[pre + torch_ln + ".weight"] = _np(layers[ln]["scale"][i])
            sd[pre + torch_ln + ".bias"] = _np(layers[ln]["bias"][i])
        sd[pre + "linear1.weight"] = _np(layers["fc1"]["kernel"][i]).T
        sd[pre + "linear1.bias"] = _np(layers["fc1"]["bias"][i])
        sd[pre + "linear2.weight"] = _np(layers["fc2"]["kernel"][i]).T
        sd[pre + "linear2.bias"] = _np(layers["fc2"]["bias"][i])
        if cfg.decoder.use_deformable:
            sd[pre + "reference_points_proj.weight"] = _np(
                layers["ref_proj"]["kernel"][i]
            ).T
            sd[pre + "reference_points_proj.bias"] = _np(layers["ref_proj"]["bias"][i])
            dp = layers["deform"]
            for ours, torch_name in (
                ("offsets", "sampling_offsets"),
                ("weights", "attention_weights"),
                ("value", "value_proj"),
                ("output", "output_proj"),
            ):
                sd[pre + f"cross_attn.{torch_name}.weight"] = _np(
                    dp[f"{ours}_kernel"][i]
                ).T
                sd[pre + f"cross_attn.{torch_name}.bias"] = _np(dp[f"{ours}_bias"][i])
        else:
            ca = layers["cross_attn"]
            sd[pre + "multihead_attn.in_proj_weight"] = np.concatenate(
                [_np(ca[p]["kernel"][i]).T for p in ("q", "k", "v")], axis=0
            )
            sd[pre + "multihead_attn.in_proj_bias"] = np.concatenate(
                [_np(ca[p]["bias"][i]) for p in ("q", "k", "v")]
            )
            sd[pre + "multihead_attn.out_proj.weight"] = _np(ca["out"]["kernel"][i]).T
            sd[pre + "multihead_attn.out_proj.bias"] = _np(ca["out"]["bias"][i])
    return sd


def save_reference_checkpoint(path: str, params: Params, cfg: DetectorConfig) -> str:
    """torch.save the exported state dict (requires torch)."""
    import torch

    sd = export_reference_state_dict(params, cfg)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)
    return path
