"""On-device Hungarian assignment (Jonker-Volgenant style, O(n^3)).

The reference solves per-image assignment on the host with scipy's
`linear_sum_assignment` inside a `@torch.no_grad` matcher
(dino_detector/matching.py:105), forcing a device->host sync every training
step. Here the full solve runs on device inside jit: the classic shortest
augmenting path algorithm with dual potentials, expressed with
`lax.while_loop` / `lax.fori_loop` over fixed-shape arrays so it traces once
and vmaps over the batch.

Design notes (TPU):
- All arrays are length N+1 (a virtual column 0 holds the augmenting-path
  bookkeeping), so every inner step is a vectorized [N+1] op — no scalar
  Python loops.
- Rows that are padding (invalid GT slots) are skipped entirely with
  `lax.cond`, so the number of augmentations equals the number of *valid*
  rows, not the padded size.
- The solver is exact for finite costs: it produces an assignment whose
  total cost matches scipy's optimum (validated in tests/test_hungarian.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e9


def _augment_one_row(i_one_based, carry, cost_pad, n):
    """Add row `i` (1-based) to the matching via shortest augmenting path.

    carry = (u, v, p, way):
      u:   [N+1] row potentials (u[0] unused)
      v:   [N+1] column potentials (v[0] = virtual column)
      p:   [N+1] int32, p[j] = row currently assigned to column j (0 = free)
      way: [N+1] int32, predecessor column on the alternating tree
    """
    u, v, p, way = carry
    p = p.at[0].set(i_one_based)

    minv = jnp.full((n + 1,), _INF, dtype=cost_pad.dtype)
    used = jnp.zeros((n + 1,), dtype=bool)
    col_real = jnp.arange(n + 1) > 0

    # Hard iteration cap: each body iteration marks one column used, so a
    # correct run takes <= n+1 iterations. The cap turns pathological inputs
    # (e.g. NaN costs, which make every comparison false and stall progress)
    # into a bounded no-op instead of an infinite on-device loop.
    def cond_fn(state):
        _, _, p_, _, _, _, j0, it = state
        return (p_[j0] != 0) & (it <= n + 1)

    def body_fn(state):
        u_, v_, p_, way_, minv_, used_, j0, it = state
        used_ = used_.at[j0].set(True)
        i0 = p_[j0]
        # Reduced costs of extending the tree from column j0's row.
        cur = cost_pad[i0] - u_[i0] - v_
        upd = (~used_) & col_real & (cur < minv_)
        minv_ = jnp.where(upd, cur, minv_)
        way_ = jnp.where(upd, j0, way_)
        # Tightest unused column.
        cand = jnp.where((~used_) & col_real, minv_, _INF)
        j1 = jnp.argmin(cand).astype(jnp.int32)
        delta = cand[j1]
        # Dual update: rows of used columns gain delta, their columns lose it.
        u_ = u_.at[p_].add(jnp.where(used_, delta, 0.0))
        v_ = jnp.where(used_, v_ - delta, v_)
        minv_ = jnp.where(used_, minv_, minv_ - delta)
        return (u_, v_, p_, way_, minv_, used_, j1, it + 1)

    state = (u, v, p, way, minv, used, jnp.int32(0), jnp.int32(0))
    u, v, p, way, minv, used, j0, _ = jax.lax.while_loop(cond_fn, body_fn, state)

    # Walk the alternating tree back to the root, flipping assignments.
    # Same n+1 cap: `way` forms a tree rooted at column 0 for valid runs.
    def r_cond(s):
        _, j, it = s
        return (j != 0) & (it <= n + 1)

    def r_body(s):
        p_, j, it = s
        j_prev = way[j]
        p_ = p_.at[j].set(p_[j_prev])
        return (p_, j_prev, it + 1)

    p, _, _ = jax.lax.while_loop(r_cond, r_body, (p, j0, jnp.int32(0)))
    return (u, v, p, way)


@functools.partial(jax.jit, static_argnames=())
def hungarian_assign(cost: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment on a square cost matrix.

    Args:
      cost: [N, N] float cost matrix. Padding entries should hold a large
        constant (same for all padding) so they never displace real matches.
      row_valid: [N] bool; invalid rows are skipped (left unassigned).

    Returns:
      row_of_col: [N] int32; row assigned to each column, -1 if the column is
        unmatched (happens when fewer valid rows than columns).
    """
    n = cost.shape[0]
    cost = cost.astype(jnp.float32)
    cost_pad = jnp.zeros((n + 1, n + 1), dtype=jnp.float32)
    cost_pad = cost_pad.at[1:, 1:].set(cost)

    init = (
        jnp.zeros((n + 1,), jnp.float32),
        jnp.zeros((n + 1,), jnp.float32),
        jnp.zeros((n + 1,), jnp.int32),
        jnp.zeros((n + 1,), jnp.int32),
    )

    # Iterate only up to the last valid row (a while_loop, so that under
    # vmap the lockstep trip count is max-over-batch of that bound instead
    # of always n — COCO batches average ~7 GT against 50+ padded slots).
    # Invalid rows below the bound are computed-then-discarded via select
    # (vmap would do the same to a lax.cond anyway).
    limit = jnp.where(
        jnp.any(row_valid),
        n - jnp.argmax(row_valid[::-1]).astype(jnp.int32),
        0,
    )

    def outer_cond(carry):
        i, _ = carry
        return i < limit

    def outer_body(carry):
        i, state = carry
        new_state = _augment_one_row(i + 1, state, cost_pad, n)
        state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(row_valid[i], a, b), new_state, state
        )
        return (i + 1, state)

    _, (_, _, p, _) = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(0), init)
    )
    return p[1:].astype(jnp.int32) - 1


# Batched version: vmap merges the per-image while_loops; each iteration is a
# [B, N+1] vector op, so the batch solves in lockstep on the VPU.
hungarian_assign_batched = jax.jit(jax.vmap(hungarian_assign, in_axes=(0, 0)))


def invert_assignment(row_of_col: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """Invert col->row into row->col.

    Args:
      row_of_col: [N] int32 as returned by `hungarian_assign`.
      num_rows: number of row slots in the output.

    Returns:
      col_of_row: [num_rows] int32, -1 where a row is unmatched.
    """
    n = row_of_col.shape[0]
    cols = jnp.arange(n, dtype=jnp.int32)
    # Scatter col index into its assigned row; dump unmatched into a trash
    # slot one past the end (then sliced off) to keep shapes static.
    rows = jnp.where(
        (row_of_col >= 0) & (row_of_col < num_rows), row_of_col, num_rows
    )
    out = jnp.full((num_rows + 1,), -1, dtype=jnp.int32)
    out = out.at[rows].set(cols)
    return out[:num_rows]
