"""Shared neural-net primitives as pure functions over param dicts.

Initializers mirror torch defaults where the reference relies on them
(nn.Linear kaiming-uniform fan-in bound; LoRA A default-init / B zero,
dino_detector/utils.py:59-63) so randomly-initialized models are
statistically comparable.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def torch_linear_init(rng: jax.Array, in_dim: int, out_dim: int) -> Params:
    """torch nn.Linear default init: W, b ~ U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "kernel": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def xavier_linear_init(rng: jax.Array, in_dim: int, out_dim: int) -> Params:
    bound = jnp.sqrt(6.0 / (in_dim + out_dim))
    return {
        "kernel": jax.random.uniform(rng, (in_dim, out_dim), jnp.float32, -bound, bound),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def trunc_normal_init(rng: jax.Array, shape, std: float = 0.02) -> jnp.ndarray:
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, jnp.float32)


def layernorm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def lora_init(rng: jax.Array, in_dim: int, out_dim: int, r: int) -> Params:
    """LoRA pair: A torch-Linear-default init, B zeros (utils.py:59-63)."""
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "lora_A": jax.random.uniform(rng, (in_dim, r), jnp.float32, -bound, bound),
        "lora_B": jnp.zeros((r, out_dim), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def linear(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    if "kernel_q" in p:  # int8 serving params (models/quantize.py)
        from .quantize import int8_linear

        return int8_linear(x, p)
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def lora_linear(x: jnp.ndarray, p: Params, alpha: float) -> jnp.ndarray:
    """Frozen base linear + alpha * B(A(x)).

    Scaling is `alpha`, NOT alpha/r — matching the reference LoraLinear
    (dino_detector/utils.py:70).
    """
    out = linear(x, p)
    if "lora_A" in p:
        delta = (x @ p["lora_A"].astype(x.dtype)) @ p["lora_B"].astype(x.dtype)
        out = out + alpha * delta
    return out


def layer_norm(x: jnp.ndarray, p: Params, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm in fp32 (TPU: keep reductions in fp32 even for bf16 x)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def dropout(
    x: jnp.ndarray, rate: float, rng: Optional[jax.Array], deterministic: bool
) -> jnp.ndarray:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def fold_lora(p: Params, alpha: float) -> Params:
    """Fold a LoRA delta into the base kernel: W' = W + alpha * A @ B.

    Used at inference/serving time so the adapted linear costs exactly one
    matmul.
    """
    if "lora_A" not in p:
        return p
    return {
        "kernel": p["kernel"] + alpha * (p["lora_A"] @ p["lora_B"]),
        "bias": p["bias"],
    }
