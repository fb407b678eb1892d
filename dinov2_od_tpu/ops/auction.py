"""Auction assignment solver — the dense-GT fast path for the matcher.

The exact JV solver (ops/hungarian.py) augments one row at a time, and
each augmenting-path step is a separate while-loop iteration of small
[N+1] vector ops. On TPU every such iteration pays a fixed multi-
microsecond overhead, so at COCO density (93 valid GT in 100 padded
slots) the solve costs ~150 ms/step — 40x the rest of the criterion
(measured; BENCH.md). The auction algorithm (Bertsekas) has the opposite
shape: each *round* is a handful of full [M, N] tensor ops in which ALL
unassigned rows bid simultaneously (Jacobi style), and a few hundred
rounds finish the assignment — exactly what the VPU wants.

Design notes, each measured on realistic + adversarial matcher costs:

- RECTANGULAR, bidders = the smaller side. The matcher orients the
  problem so queries (rows, all real) bid for GT-slot columns. With
  Q=50 bidding into 100 columns there are always spare columns, so
  near-tie costs (93 near-duplicate GT boxes) cause little price war:
  a displaced bidder finds another near-identical column at price ~0
  instead of escalating. The reverse orientation (93 GT bidding for 50
  real query columns + 50 uniform pads) price-wars in eps increments —
  measured up to 20k rounds vs <= ~1.1k transposed. Bytes per round
  also halve ([Q, N] not [N, N]).
- Single phase, fixed eps, when M < N: a column that receives a bid
  stays assigned forever within a phase, so every unassigned column
  still has price 0 at termination and eps-complementary slackness
  gives total_cost <= optimal + M * eps * (cost range). eps-scaling is
  UNSOUND here (columns abandoned between phases keep stale prices;
  measured gap ~12-47 where the bound says ~1) — but it is also
  unnecessary: low contention keeps single-phase round counts small.
- eps-scaling (eps 0.1 -> /4 -> ... -> eps_final) when M == N: the
  symmetric case has maximal contention (every column needed), where
  fixed-eps can price-war near-ties for thousands of rounds; but every
  phase of a symmetric auction terminates with ALL columns assigned, so
  no stale prices exist and the textbook scaling bound applies.
- Uniform-column perturbation: padding columns all cost the same, so
  bidders forced onto them are indifferent and bid in eps increments.
  A tiny distinct preference (delta * fixed pseudo-random table on pad
  columns only) breaks those ties; it perturbs only which pad column
  absorbs which leftover bidder — invisible to the real objective.
- K rounds per `lax.while_loop` body: amortizes the per-iteration
  fixed overhead; rounds after convergence place no bids (no-ops).

Near-ties may resolve differently than scipy's optimum, which the loss
cannot feel and tests account for by comparing total cost, not indices.

The reference solves this per image on the host with scipy inside
@torch.no_grad (dino_detector/matching.py:105).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1e9


@functools.partial(
    jax.jit,
    static_argnames=(
        "eps", "scale_phases", "eps0", "theta", "delta",
        "rounds_per_step", "round_cap",
    ),
)
def auction_assign(
    cost: jnp.ndarray,
    row_valid: jnp.ndarray,
    col_pad: jnp.ndarray | None = None,
    *,
    eps: float = 1e-3,
    scale_phases: bool = False,
    eps0: float = 0.1,
    theta: float = 4.0,
    delta: float = 4e-3,
    rounds_per_step: int = 8,
    round_cap: int = 4000,
) -> jnp.ndarray:
    """Assign valid rows to columns, minimizing total cost (eps-optimal).

    Args:
      cost: [M, N] float cost matrix, M <= N. Padding entries must hold
        a value above every real entry; for the tightest eps bound the
        caller should clip padding to just above the real max (uniform
        padding anywhere above the real range yields the same optimum).
      row_valid: [M] bool; invalid rows never bid and are left
        unassigned.
      col_pad: optional [N] bool marking uniform-cost padding columns to
        receive the tie-breaking delta perturbation.
      eps: bid increment (relative to the cost range) for the single-
        phase mode; also the final increment of the scaling mode.
      scale_phases: run an eps-scaling schedule (eps0 -> /theta -> ...
        -> eps). ONLY sound when every column is guaranteed assigned at
        each phase end, i.e. the problem is square with all rows valid;
        callers must not set it for M < N problems (stale prices on
        abandoned columns break the optimality bound).

    Returns:
      row_of_col: [N] int32 — valid row assigned to each column, -1 if
      none.
    """
    m, n = cost.shape
    cost = cost.astype(jnp.float32)

    # Normalize to benefits in [0, 1] (higher is better); eps is relative
    # to the cost range.
    cmin = jnp.min(cost)
    scale = jnp.maximum(jnp.max(cost) - cmin, 1e-12)
    benefit = (jnp.max(cost) - cost) / scale  # [M, N]
    if col_pad is not None:
        perturb = jax.random.uniform(jax.random.key(17), (m, n), jnp.float32)
        benefit = benefit + jnp.where(col_pad[None, :], delta, 0.0) * perturb
    rows = jnp.arange(m)
    cols = jnp.arange(n, dtype=jnp.int32)

    eps_phases = []
    if scale_phases:
        e = eps0
        while e > eps:
            eps_phases.append(e)
            e /= theta
    eps_phases.append(eps)

    def one_round(e, s):
        # NO gathers/scatters anywhere: under vmap on TPU a per-row
        # scatter (v.at[rows, j1].set) or gather (benefit[rows, j1])
        # lowers to serialized dynamic-slice loops — measured ~10x the
        # cost of the equivalent compare+select vector ops used here.
        p, col_of_row, row_of_col = s
        unass = row_valid & (col_of_row < 0)  # [M]

        v = benefit - p[None, :]  # [M, N]
        j1 = jnp.argmax(v, axis=1)  # best column per row
        best_mask = j1[:, None] == cols[None, :]  # [M, N] one-hot
        v1 = jnp.max(v, axis=1)
        v2 = jnp.max(jnp.where(best_mask, _NEG, v), axis=1)  # second-best
        b1 = v1 + jnp.max(jnp.where(best_mask, p[None, :], _NEG), axis=1)
        # Price the bidder is willing to pay for its best column.
        bid = b1 - v2 + e  # [M]
        bid = jnp.where(unass, bid, _NEG)

        # Column-wise winner among this round's bidders (lowest row index
        # wins exact ties via argmax-first semantics).
        bidmat = jnp.where(
            best_mask & unass[:, None], bid[:, None], _NEG
        )  # [M, N]
        colmax = jnp.max(bidmat, axis=0)
        winner = jnp.argmax(bidmat, axis=0).astype(jnp.int32)
        has_bid = colmax > _NEG / 2

        p = jnp.where(has_bid, colmax, p)
        row_of_col = jnp.where(has_bid, winner, row_of_col)
        # Rebuild col_of_row from row_of_col; owners displaced by this
        # round's winners drop out automatically.
        own = row_of_col[None, :] == rows[:, None]  # [M, N]
        col_of_row = jnp.where(
            jnp.any(own, axis=1),
            jnp.argmax(own, axis=1).astype(jnp.int32),
            -1,
        )
        return (p, col_of_row, row_of_col)

    prices = jnp.zeros((n,), jnp.float32)
    budget = jnp.int32(round_cap)
    col_of_row = jnp.full((m,), -1, jnp.int32)
    row_of_col = jnp.full((n,), -1, jnp.int32)

    for phase_eps in eps_phases:
        # Phase start clears the assignment (coarse-eps pairs must be
        # re-verified at the finer eps) — but ONLY while round budget
        # remains: if an earlier phase exhausted it, clearing here would
        # discard the entire coarse assignment (the while below would
        # not run) and leave the greedy completion to emit an arbitrary
        # pairing. With no budget left, carry the previous phase's
        # result through instead.
        init = (
            prices,
            jnp.where(budget > 0, jnp.full((m,), -1, jnp.int32), col_of_row),
            jnp.where(budget > 0, jnp.full((n,), -1, jnp.int32), row_of_col),
            budget,
        )

        def cond_fn(s):
            _, col_of_row, _, left = s
            return jnp.any(row_valid & (col_of_row < 0)) & (left > 0)

        def body_fn(s, e=phase_eps):
            p, col_of_row, row_of_col, left = s
            inner = (p, col_of_row, row_of_col)
            # Unrolled rounds amortize the per-iteration overhead; extra
            # rounds after convergence place no bids (no-ops).
            for _ in range(rounds_per_step):
                inner = one_round(e, inner)
            p, col_of_row, row_of_col = inner
            return (p, col_of_row, row_of_col, left - rounds_per_step)

        prices, col_of_row, row_of_col, budget = jax.lax.while_loop(
            cond_fn, body_fn, init
        )

    # Greedy completion if the round budget ran out (not observed below
    # the cap in practice): the r-th leftover valid row takes the r-th
    # free column, keeping the output a valid partial assignment.
    left_rows = row_valid & (col_of_row < 0)  # [M]
    free_cols = row_of_col < 0  # [N]
    row_rank = jnp.cumsum(left_rows) - 1
    col_rank = jnp.cumsum(free_cols) - 1
    rows_by_rank = (
        jnp.full((m + 1,), -1, jnp.int32)
        .at[jnp.where(left_rows, row_rank, m)]
        .set(jnp.arange(m, dtype=jnp.int32))[:m]
    )
    fill = jnp.where(
        free_cols & (col_rank < jnp.sum(left_rows)),
        rows_by_rank[jnp.clip(col_rank, 0, m - 1)],
        -1,
    )
    return jnp.where(row_of_col >= 0, row_of_col, fill).astype(jnp.int32)
