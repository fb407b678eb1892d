"""HF PyTorch DINOv2 checkpoint -> JAX backbone params importer.

The reference loads pretrained weights with
`Dinov2Model.from_pretrained(...)` over the network
(dino_detector/models/dinov2_backbone.py:11). This environment has no
egress, so the importer consumes a *local* HF checkpoint: a directory
containing `pytorch_model.bin` / `model.safetensors`, a bare state-dict
file, or an in-memory state dict.

Key mapping (HF Dinov2Model state dict -> our pytree; torch Linear weights
are [out, in] and get transposed to [in, out]):

  embeddings.cls_token                      -> cls_token
  embeddings.patch_embeddings.projection.*  -> patch_embed (OIHW -> HWIO)
  embeddings.position_embeddings            -> pos_embed (bicubic-resampled
                                               to the configured grid)
  encoder.layer.{i}.norm1/norm2             -> blocks.ln1/ln2
  encoder.layer.{i}.attention.attention.query/key/value -> blocks.q/k/v
  encoder.layer.{i}.attention.output.dense  -> blocks.proj
  encoder.layer.{i}.layer_scale1/2.lambda1  -> blocks.ls1/ls2
  encoder.layer.{i}.mlp.fc1/fc2             -> blocks.fc1/fc2   (MLP)
  encoder.layer.{i}.mlp.weights_in/out      -> blocks.fc1/fc2   (SwiGLU)
  layernorm.*                               -> ln_f

LoRA factors and the projection head are NOT in HF checkpoints; they keep
their initialization from the provided template (A default-init, B zero —
so the imported model's forward is exactly the pretrained backbone).

Numerical parity with torch is validated in tests/test_import_torch.py by
running transformers' Dinov2Model on the same random weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import BackboneConfig
from .vit import interpolate_pos_embed

Params = Dict[str, Any]


def _load_state_dict(path_or_sd) -> Mapping[str, "np.ndarray"]:
    """Accept a state dict, a checkpoint file, or an HF model directory."""
    if isinstance(path_or_sd, Mapping):
        sd = path_or_sd
    else:
        path = str(path_or_sd)
        if os.path.isdir(path):
            for cand in ("model.safetensors", "pytorch_model.bin"):
                f = os.path.join(path, cand)
                if os.path.exists(f):
                    path = f
                    break
            else:
                raise FileNotFoundError(
                    f"no model.safetensors / pytorch_model.bin under {path}"
                )
        if path.endswith(".safetensors"):
            from safetensors.torch import load_file

            sd = load_file(path)
        else:
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]

    def to_np(v):
        if hasattr(v, "detach"):
            return v.detach().cpu().numpy()
        return np.asarray(v)

    return {k: to_np(v) for k, v in sd.items()}


def load_dinov2_backbone_params(
    checkpoint, cfg: BackboneConfig, template: Params
) -> Params:
    """Build backbone params from an HF DINOv2 checkpoint.

    Args:
      checkpoint: path / directory / state dict (see _load_state_dict).
      cfg: target backbone config (grid size may differ from the
        checkpoint; position embeddings are resampled).
      template: randomly-initialized params (source of LoRA factors and
        the optional projection head).

    Returns:
      params pytree matching the template's structure.
    """
    sd = _load_state_dict(checkpoint)
    # Tolerate a 'dinov2.' / 'dino.' prefix (wrapped checkpoints).
    for prefix in ("dinov2.", "dino.", "backbone.dino."):
        if any(k.startswith(prefix) for k in sd):
            sd = {
                k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
            }
            break

    d = cfg.hidden_dim
    depth = cfg.depth

    def t(key):  # torch Linear weight -> [in, out]
        return jnp.asarray(sd[key]).T

    def a(key):
        return jnp.asarray(sd[key])

    params: Params = dict(template)
    params["patch_embed"] = {
        # OIHW -> HWIO
        "kernel": jnp.transpose(
            a("embeddings.patch_embeddings.projection.weight"), (2, 3, 1, 0)
        ),
        "bias": a("embeddings.patch_embeddings.projection.bias"),
    }
    params["cls_token"] = a("embeddings.cls_token")

    pos = a("embeddings.position_embeddings")  # [1, 1+N_src, D]
    src_n = pos.shape[1] - 1
    src_grid = int(round(src_n**0.5))
    params["pos_embed"] = interpolate_pos_embed(pos, src_grid, cfg.grid_size)

    moe = cfg.ffn_type == "moe"
    if moe:
        from .vit import moe_boundary

        boundary = moe_boundary(cfg)
        if "encoder.layer.0.mlp.weights_in.weight" in sd:
            raise ValueError(
                "MoE expert upcycling requires an MLP (gelu) DINOv2 "
                "checkpoint; this one uses SwiGLU FFNs (weights_in/out)"
            )
    else:
        boundary = depth

    blocks = []
    moe_blocks = []
    swiglu = cfg.ffn_type == "swiglu"
    for i in range(depth):
        pre = f"encoder.layer.{i}."
        if swiglu:
            fc1_w, fc1_b = t(pre + "mlp.weights_in.weight"), a(pre + "mlp.weights_in.bias")
            fc2_w, fc2_b = t(pre + "mlp.weights_out.weight"), a(pre + "mlp.weights_out.bias")
        else:
            fc1_w, fc1_b = t(pre + "mlp.fc1.weight"), a(pre + "mlp.fc1.bias")
            fc2_w, fc2_b = t(pre + "mlp.fc2.weight"), a(pre + "mlp.fc2.bias")
        block = {
            "ln1": {"scale": a(pre + "norm1.weight"), "bias": a(pre + "norm1.bias")},
            "q": {"kernel": t(pre + "attention.attention.query.weight"),
                  "bias": a(pre + "attention.attention.query.bias")},
            "k": {"kernel": t(pre + "attention.attention.key.weight"),
                  "bias": a(pre + "attention.attention.key.bias")},
            "v": {"kernel": t(pre + "attention.attention.value.weight"),
                  "bias": a(pre + "attention.attention.value.bias")},
            "proj": {"kernel": t(pre + "attention.output.dense.weight"),
                     "bias": a(pre + "attention.output.dense.bias")},
            "ls1": a(pre + "layer_scale1.lambda1"),
            "ln2": {"scale": a(pre + "norm2.weight"), "bias": a(pre + "norm2.bias")},
            "ls2": a(pre + "layer_scale2.lambda1"),
        }
        if i < boundary:
            block["fc1"] = {"kernel": fc1_w, "bias": fc1_b}
            block["fc2"] = {"kernel": fc2_w, "bias": fc2_b}
            blocks.append(block)
        else:
            # Sparse upcycling (Komatsuzaki et al. 2023): every expert
            # starts as a copy of the block's pretrained dense FFN (the
            # experts diverge through routing); the router stays at the
            # template's random init.
            e = cfg.moe_num_experts
            block["moe"] = {
                "fc1_kernel": jnp.broadcast_to(fc1_w, (e,) + fc1_w.shape),
                "fc1_bias": jnp.broadcast_to(fc1_b, (e,) + fc1_b.shape),
                "fc2_kernel": jnp.broadcast_to(fc2_w, (e,) + fc2_w.shape),
                "fc2_bias": jnp.broadcast_to(fc2_b, (e,) + fc2_b.shape),
            }
            moe_blocks.append(block)

    # Stack over depth, then graft the template's LoRA factors (and MoE
    # routers) back in.
    import jax

    def stack_with_template(block_list, tmpl):
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *block_list)
        for lin in ("q", "k", "v", "proj", "fc1", "fc2"):
            if lin not in tmpl:
                continue
            for lora_key in ("lora_A", "lora_B"):
                if lora_key in tmpl[lin]:
                    stacked[lin][lora_key] = tmpl[lin][lora_key]
        if "moe" in stacked:
            stacked["moe"]["router_kernel"] = tmpl["moe"]["router_kernel"]
        return stacked

    if blocks:
        params["blocks"] = stack_with_template(blocks, template["blocks"])
    if moe_blocks:
        params["moe_blocks"] = stack_with_template(
            moe_blocks, template["moe_blocks"]
        )

    params["ln_f"] = {"scale": a("layernorm.weight"), "bias": a("layernorm.bias")}
    if "projection" in template:
        params["projection"] = template["projection"]
    return params
