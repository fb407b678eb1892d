"""Mixture-of-Experts FFN with expert parallelism (beyond reference).

The reference (mudit1729/dinov2-od) has dense FFNs only; this adds an
optional MoE FFN for the ViT backbone (`BackboneConfig.ffn_type_override
= "moe"`) so the framework's parallelism surface includes EP alongside
DP/TP/PP/CP.

TPU-first design — GShard-style capacity routing (Lepikhin et al. 2020),
not token-list scatter/gather:

- **Static shapes everywhere.** Each expert processes a fixed capacity
  ``C = ceil(top_k * tokens/expert * capacity_factor)`` of slots per
  batch row; tokens routed past capacity are dropped (their FFN output
  is zero — the residual connection carries them through, the standard
  MoE semantics). No data-dependent shapes, so the whole thing jits.
- **Dispatch/combine as einsums.** The routing decisions become a
  [B, N, E, C] combine tensor; dispatch and un-dispatch are single
  einsums that XLA lowers onto the MXU, and the expert FFN itself is a
  batched [E, ...] GEMM pair.
- **EP over the mesh.** Expert weights shard their leading E dim over
  the model axis (parallel/sharding.py "moe" rules). The dispatched
  activations get an explicit sharding constraint [E -> model axis,
  B -> data axis], so XLA partitions the expert GEMMs over the mesh and
  inserts the all-to-all-shaped resharding around them — the jax
  equivalent of the NCCL all_to_all an expert-parallel torch
  implementation would hand-write.

Gate math in fp32 regardless of activation dtype (router logits are
numerically delicate under bf16 softmax).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def moe_capacity(
    num_tokens: int, num_experts: int, top_k: int, capacity_factor: float
) -> int:
    """Per-expert slot count for a batch row of `num_tokens` tokens."""
    return max(1, math.ceil(top_k * num_tokens / num_experts * capacity_factor))


def moe_routing(
    logits: jnp.ndarray, top_k: int, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k capacity routing from router logits.

    Args:
      logits: [B, N, E] router logits (any float dtype; softmax in fp32).
      top_k: experts per token.
      capacity: slots per expert (per batch row).

    Returns:
      combine: [B, N, E, C] float32 — combine weights (renormalized top-k
        gate probabilities at the token's assigned slot, 0 elsewhere /
        for capacity-dropped tokens).
      aux: scalar float32 load-balance loss (Switch/GShard form):
        ``E * mean_e(f_e * P_e)`` where f_e is the fraction of tokens
        whose TOP-1 choice is expert e and P_e the mean router
        probability of e. Equals 1.0 at perfect balance.
    """
    b, n, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)  # [B,N,E]

    gate_vals, gate_idx = jax.lax.top_k(probs, top_k)  # [B,N,k]
    # Renormalize the selected gates to sum to 1 per token (GShard).
    gate_vals = gate_vals / jnp.maximum(
        jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
    )

    # Sequential slot assignment over the k choices: top-1 assignments
    # claim capacity first (standard priority), then top-2, etc. k is a
    # tiny static constant, so the Python loop unrolls at trace time.
    combine = jnp.zeros((b, n, e, capacity), jnp.float32)
    counts = jnp.zeros((b, e), jnp.int32)  # slots already claimed
    for j in range(top_k):
        onehot = jax.nn.one_hot(gate_idx[..., j], e, dtype=jnp.int32)  # [B,N,E]
        # Position of each token within its chosen expert's slot list:
        # tokens earlier in the row claim earlier slots (exclusive cumsum),
        # offset by slots claimed in previous k-rounds.
        pos = jnp.cumsum(onehot, axis=1) - onehot + counts[:, None, :]  # [B,N,E]
        keep = (pos < capacity) & (onehot > 0)  # [B,N,E] bool
        slot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # [B,N,E,C]
        combine = combine + (
            gate_vals[..., j][:, :, None, None]
            * keep[..., None].astype(jnp.float32)
            * slot
        )
        counts = counts + jnp.sum(onehot * keep.astype(jnp.int32), axis=1)

    # Load-balance aux: fraction routed (top-1) x mean prob, per expert.
    top1 = jax.nn.one_hot(gate_idx[..., 0], e, dtype=jnp.float32)
    f = jnp.mean(top1, axis=(0, 1))  # [E]
    p = jnp.mean(probs, axis=(0, 1))  # [E]
    aux = e * jnp.sum(f * p)
    return combine, aux


def moe_ffn(
    x: jnp.ndarray,
    mp: Params,
    *,
    top_k: int,
    capacity_factor: float,
    activation,
    mesh=None,
    ep_axis: Optional[str] = None,
    data_axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MoE feed-forward: route, expert FFN, combine.

    Args:
      x: [B, N, d] tokens.
      mp: MoE params — router_kernel [d, E], fc1_kernel [E, d, m],
        fc1_bias [E, m], fc2_kernel [E, m, d], fc2_bias [E, d].
      activation: elementwise nonlinearity between the expert GEMMs.
      mesh / ep_axis / data_axis: when given, the dispatched activations
        carry an explicit sharding constraint (E over ep_axis, B over
        data_axis) so the expert GEMMs partition over the mesh (EP).

    Returns:
      (out [B, N, d] in x.dtype, aux scalar fp32 load-balance loss).
    """
    b, n, d = x.shape
    e = mp["router_kernel"].shape[-1]
    capacity = moe_capacity(n, e, top_k, capacity_factor)

    logits = x @ mp["router_kernel"].astype(x.dtype)  # [B,N,E]
    combine, aux = moe_routing(logits, top_k, capacity)
    dispatch = (combine > 0).astype(x.dtype)  # [B,N,E,C]

    dispatched = jnp.einsum("bnec,bnd->ebcd", dispatch, x)  # [E,B,C,d]
    if mesh is not None and ep_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = NamedSharding(mesh, P(ep_axis, data_axis, None, None))
        dispatched = jax.lax.with_sharding_constraint(dispatched, spec)

    h = (
        jnp.einsum("ebcd,edm->ebcm", dispatched, mp["fc1_kernel"].astype(x.dtype))
        + mp["fc1_bias"].astype(x.dtype)[:, None, None, :]
    )
    h = activation(h)
    out_e = (
        jnp.einsum("ebcm,emd->ebcd", h, mp["fc2_kernel"].astype(x.dtype))
        + mp["fc2_bias"].astype(x.dtype)[:, None, None, :]
    )
    if mesh is not None and ep_axis is not None:
        out_e = jax.lax.with_sharding_constraint(out_e, spec)

    # Combine zeroes the never-dispatched slots, so the fc2 bias added to
    # empty slots does not leak into the output.
    out = jnp.einsum("bnec,ebcd->bnd", combine.astype(x.dtype), out_e)
    return out, aux
