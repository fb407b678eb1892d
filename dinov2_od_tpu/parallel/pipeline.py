"""Pipeline parallelism for the backbone depth: GPipe and interleaved
(Megatron-style multi-chunk) schedules.

The block stack [L, ...] is split over a mesh axis of P stages;
microbatches stream through with `ppermute` neighbor hops (ICI).
Expressed with `shard_map` + `lax.scan`, so the backward pass (reverse
schedule) falls out of AD through the differentiable ppermute — no
hand-written 1F1B machinery, XLA overlaps the collective with compute.

With `num_chunks=v > 1` each device holds v NON-consecutive depth chunks
(device p owns global chunks {p, P+p, ..., (v-1)P+p}) and every
microbatch laps the ring v times — the interleaved schedule. The key
observation that keeps the dataflow identical to GPipe's single
per-tick ring hop: device P-1's output for (microbatch j, lap c) at
tick t is consumed by device 0 as (j, c+1) at tick t+1, because the
schedule processes microbatches in groups of P (device 0's timeline is
g*vP + c*P + r -> (mb gP+r, lap c), and u + P lands exactly on
(same mb, lap c+1)). So only the input selection (inject vs ring) and
the per-tick chunk index change; there are no queues.

Bubble economics (chunk-ticks, one chunk = depth/(P*v) blocks):
  GPipe (v=1):      total = v*(m + P - 1),  bubble = v*(P-1)
  interleaved:      total = v*m + P - 1,    bubble = P-1  (v times less)
The reference has no pipeline story (single-GPU DDP only, SURVEY.md
§2c); this fills the PP row of the parallelism matrix alongside DP
(batch sharding), TP (Megatron col/row specs), and SP/CP (ring
attention).

Design notes:
- Bubble ticks: by default every stage executes its chunk every tick, on
  garbage during bubble ticks, and the masked output writes zero the
  bubble-path cotangents — a static graph, exact gradients. On a
  lock-stepped real mesh the bubble compute is NOT on the critical path
  (it overlaps other stages' live ticks), so it costs energy, not
  wall-clock. `skip_bubbles=True` instead skips the chunk via `lax.cond`
  on a scalar liveness predicate (no collectives inside the cond, so
  per-device branching cannot deadlock the SPMD program). Measured on
  the 8-device CPU mesh (P=4, m=4, depth 8): forward 41.8 -> 27.6 ms
  (bubble FLOPs gone), but forward+BACKWARD 177 -> 222 ms — AD through
  the cond costs more than the skipped bubble FLOPs save. Hence the
  default stays the static graph for training; enable the skip for
  forward-only workloads.
- `ppermute` is a full ring (P-1 wraps to 0); the wrap value is only
  consumed when v > 1 (lap continuation).
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
    num_chunks: int = 1,
    auto_axes: tuple = (),
) -> jnp.ndarray:
    """Run a depth-stacked block sequence as a pipeline over `axis`.

    Args:
      x: [B, ...] input activations (replicated).
      stacked_params: pytree whose leaves have leading dim L (depth);
        L must divide by stages*num_chunks into equal chunks.
      block_fn: (carry, per_block_params) -> (carry, None), the same
        body used by the sequential `lax.scan` path.
      num_microbatches: microbatch count M (0 -> the axis size).
        B must be divisible by M; with num_chunks > 1, M must also be a
        multiple of the stage count (the interleaved schedule injects
        microbatches in groups of P).
      skip_bubbles: skip bubble-tick compute with lax.cond. Saves the
        bubble FLOPs on forward-only workloads; leave False when the
        result is differentiated (see module docstring: the cond's AD
        overhead exceeds the saving).
      num_chunks: chunks per device (v). 1 = GPipe; >1 = interleaved
        schedule with a v-times smaller bubble.
      auto_axes: mesh axes to leave AUTO (not manual) in the pipeline's
        shard_map — the PP x TP composition: pass the tensor-parallel
        axis here and the per-stage compute auto-partitions over it
        (GEMMs via the SPMD partitioner; attention via its own NESTED
        shard_map bound to the context mesh). Batch stays sharded over
        the remaining manual non-stage axes.

    Returns:
      [B, ...] output activations (replicated).
    """
    n_stages = mesh.shape[axis]
    v = num_chunks
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if v < 1:
        raise ValueError(f"num_chunks must be >= 1, got {v}")
    if depth % (n_stages * v) != 0:
        raise ValueError(
            f"depth {depth} not divisible by stages x chunks "
            f"({n_stages} x {v})"
        )
    m = num_microbatches or n_stages
    if v > 1 and m % n_stages != 0:
        raise ValueError(
            f"interleaved schedule needs microbatches ({m}) divisible by "
            f"stages ({n_stages})"
        )
    # The batch stays sharded over the other MANUAL mesh axes (DP
    # composes with PP); microbatching applies to the per-data-shard
    # batch. Auto axes (PP x TP) carry tensor shards, not batch.
    manual = tuple(a for a in mesh.axis_names if a not in auto_axes)
    if axis in auto_axes:
        raise ValueError(f"pipeline axis {axis!r} cannot be in auto_axes")
    other_axes = tuple(a for a in manual if a != axis)
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

    cd = depth // (n_stages * v)  # blocks per chunk
    if v > 1:
        # Global chunk ch = c*P + p must land on device p as its c-th
        # local chunk: [L] -> [v, P, cd] (ch -> [c, p]) -> [P, v, cd],
        # then flatten so the P(axis) shard gives device p its v chunks.
        stacked_params = jax.tree_util.tree_map(
            lambda a: jnp.moveaxis(
                a.reshape((v, n_stages, cd) + a.shape[1:]), 1, 0
            ).reshape((depth,) + a.shape[1:]),
            stacked_params,
        )
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def local(x_full, my_blocks):
        p = jax.lax.axis_index(axis)
        b_loc = x_full.shape[0]
        mb = b_loc // m
        x_micro = x_full.reshape((m, mb) + x_full.shape[1:])
        my_chunks = jax.tree_util.tree_map(
            lambda a: a.reshape((v, cd) + a.shape[1:]), my_blocks
        )

        def chunk(inp, c):
            params_c = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, c, axis=0, keepdims=False
                ),
                my_chunks,
            )
            out, _ = jax.lax.scan(block_fn, inp, params_c)
            return out

        # The (P-1 -> 0) wrap edge only carries live payload when the
        # interleaved schedule feeds chunk c+1 from the last stage's
        # chunk-c output; under GPipe (v == 1) stage 0 always injects
        # fresh microbatches, so the wrap would ship one dead
        # activation-sized transfer per tick — drop it.
        if v > 1:
            perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        else:
            perm = [(i, i + 1) for i in range(n_stages - 1)]
        ticks = v * m + n_stages - 1

        def tick(carry, t):
            recv, outputs = carry
            # Device 0's schedule at step u: group g of P microbatches,
            # lap c, member r -> (mb g*P+r, local chunk c); device p runs
            # the same sequence delayed by p ticks (on global chunk
            # c*P + p, which IS its c-th local chunk).
            u = t - p
            live = (u >= 0) & (u < v * m)
            uc = jnp.clip(u, 0, v * m - 1)
            g = uc // (v * n_stages)
            rem = uc % (v * n_stages)
            c = rem // n_stages
            r = rem % n_stages
            j = g * n_stages + r
            inject = (p == 0) & (c == 0)
            inp = jnp.where(inject, x_micro[j], recv)
            if skip_bubbles:
                out = jax.lax.cond(
                    live, chunk, lambda z, _: z, inp, c
                )
            else:
                out = chunk(inp, c)
            # The last stage finishes microbatch j on its last lap; the
            # masked write also zeroes bubble-path cotangents.
            final = (p == n_stages - 1) & (c == v - 1) & live
            outputs = outputs.at[j].set(
                jnp.where(final, out, outputs[j])
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

    kwargs = {}
    if auto_axes:
        kwargs["axis_names"] = set(manual)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(batch_spec, param_specs),
        out_specs=batch_spec,
        check_vma=False,
        **kwargs,
    )(x, stacked_params)
