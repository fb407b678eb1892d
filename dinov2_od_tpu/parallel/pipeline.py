"""GPipe-style pipeline parallelism for the backbone depth.

The block stack [L, ...] is split into P consecutive stages over a mesh
axis; microbatches stream through the stages with `ppermute` neighbor
hops (ICI), giving the classic (M + P - 1)-tick schedule. Expressed with
`shard_map` + `lax.scan`, so the backward pass (reverse schedule) falls
out of AD through the differentiable ppermute — no hand-written 1F1B
machinery, XLA overlaps the collective with compute.

The reference has no pipeline story (single-GPU DDP only, SURVEY.md
§2c); this fills the PP row of the parallelism matrix alongside DP
(batch sharding), TP (Megatron col/row specs), and SP/CP (ring
attention).

Design notes:
- Bubble ticks: by default every stage executes its block stack every
  tick, on garbage during its (P-1) bubble ticks, and the masked output
  writes zero the bubble-path cotangents — a static graph, exact
  gradients. On a lock-stepped real mesh the bubble compute is NOT on
  the critical path (it overlaps other stages' live ticks), so it costs
  energy, not wall-clock. `skip_bubbles=True` instead skips the stage
  body via `lax.cond` on a scalar liveness predicate (stage p is live
  at ticks p..p+m-1; the cond contains no collectives, so per-device
  branching cannot deadlock the SPMD program). Measured on the
  8-device CPU mesh (P=4, m=4, depth 8): forward 41.8 -> 27.6 ms
  (bubble FLOPs gone), but forward+BACKWARD 177 -> 222 ms — AD through
  the cond (branch-residual plumbing per tick) costs more than the
  skipped bubble FLOPs save. Hence the default stays the static graph
  for training; enable the skip for forward-only workloads (feature
  extraction, pipelined eval) or energy-bound deployments.
- `ppermute` destinations with no source receive zeros, which keeps
  bubble values finite either way.
- Bubble fraction is structural for GPipe: (P-1)/(m+P-1). Choose
  num_microbatches >= 4*P to keep it under ~20%; interleaved/looping
  schedules that shrink it further are a multi-chip-hardware project.
- Memory follows GPipe: activations for all live microbatches are held
  for the backward; wrap the stage in `jax.checkpoint` upstream (remat)
  if that exceeds HBM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def pipeline_blocks(
    x: jnp.ndarray,
    stacked_params,
    block_fn: Callable,
    mesh: Mesh,
    axis: str,
    num_microbatches: int = 0,
    skip_bubbles: bool = False,
) -> jnp.ndarray:
    """Run a depth-stacked block sequence as a pipeline over `axis`.

    Args:
      x: [B, ...] input activations (replicated).
      stacked_params: pytree whose leaves have leading dim L (depth);
        L must divide the axis size into consecutive equal stages.
      block_fn: (carry, per_block_params) -> (carry, None), the same
        body used by the sequential `lax.scan` path.
      num_microbatches: microbatch count M (0 -> the axis size).
        B must be divisible by M.
      skip_bubbles: skip bubble-tick compute with lax.cond. Saves the
        bubble FLOPs on forward-only workloads; leave False when the
        result is differentiated (see module docstring: the cond's AD
        overhead exceeds the saving).

    Returns:
      [B, ...] output activations (replicated).
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(
            f"depth {depth} not divisible by pipeline stages {n_stages}"
        )
    m = num_microbatches or n_stages
    # The batch stays sharded over the other mesh axes (DP composes with
    # PP); microbatching applies to the per-data-shard batch.
    other_axes = tuple(a for a in mesh.axis_names if a != axis)
    dp = 1
    for a in other_axes:
        dp *= mesh.shape[a]
    b = x.shape[0]
    if b % (dp * m) != 0:
        raise ValueError(
            f"batch {b} not divisible by data shards x microbatches "
            f"({dp} x {m})"
        )
    batch_spec = P(other_axes if other_axes else None)

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def local(x_full, my_blocks):
        p = jax.lax.axis_index(axis)
        b_loc = x_full.shape[0]
        mb = b_loc // m
        x_micro = x_full.reshape((m, mb) + x_full.shape[1:])

        def stage(inp):
            out, _ = jax.lax.scan(block_fn, inp, my_blocks)
            return out

        perm = [(i, i + 1) for i in range(n_stages - 1)]
        ticks = m + n_stages - 1

        def tick(carry, t):
            recv, outputs = carry
            idx_in = jnp.clip(t, 0, m - 1)
            inp = jnp.where(p == 0, x_micro[idx_in], recv)
            if skip_bubbles:
                # Stage p holds microbatch t - p; outside [0, m) it's a
                # bubble tick — skip the block stack (scalar cond: one
                # branch executes; no collectives inside).
                live_compute = (t >= p) & (t - p < m)
                out = jax.lax.cond(live_compute, stage, lambda z: z, inp)
            else:
                out = stage(inp)
            # Last stage writes microbatch (t - (P-1)) when it is live;
            # the masked write also zeroes bubble-path cotangents.
            oidx = jnp.clip(t - (n_stages - 1), 0, m - 1)
            live = (p == n_stages - 1) & (t >= n_stages - 1) & (t - (n_stages - 1) < m)
            outputs = outputs.at[oidx].set(
                jnp.where(live, out, outputs[oidx])
            )
            recv = jax.lax.ppermute(out, axis, perm)
            return (recv, outputs), None

        init = (
            jnp.zeros_like(x_micro[0]),
            jnp.zeros_like(x_micro),
        )
        (_, outputs), _ = jax.lax.scan(
            tick, init, jnp.arange(ticks, dtype=jnp.int32)
        )
        # Only the last stage holds real outputs; psum replicates them
        # over the pipeline axis.
        outputs = jnp.where(p == n_stages - 1, outputs, 0.0)
        outputs = jax.lax.psum(outputs, axis)
        return outputs.reshape((b_loc,) + x_full.shape[1:])

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(batch_spec, param_specs),
        out_specs=batch_spec,
        check_vma=False,
    )(x, stacked_params)
