"""Hungarian solver tests against the scipy oracle.

The reference delegates to scipy.optimize.linear_sum_assignment on the host
(dino_detector/matching.py:105); our on-device solver must reach the same
optimal total cost (indices may differ on cost ties)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from dinov2_od_tpu.ops.hungarian import (
    hungarian_assign,
    hungarian_assign_batched,
    invert_assignment,
)

PAD = 1e4


def _total_cost_from_row_of_col(cost, row_of_col):
    total = 0.0
    seen = set()
    for j, i in enumerate(row_of_col):
        if i >= 0:
            assert i not in seen, "row assigned twice"
            seen.add(i)
            total += cost[i, j]
    return total


@pytest.mark.parametrize("n", [1, 2, 5, 16, 50])
def test_square_matches_scipy(rng, n):
    cost = rng.normal(size=(n, n)).astype(np.float32) * 10.0
    row_valid = np.ones((n,), bool)
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(row_valid)))
    # All columns matched, all rows distinct.
    assert sorted(out.tolist()) == list(range(n))
    ours = _total_cost_from_row_of_col(cost, out)
    ri, ci = linear_sum_assignment(cost)
    np.testing.assert_allclose(ours, cost[ri, ci].sum(), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("n_valid,n", [(0, 8), (1, 8), (3, 8), (8, 8), (5, 50)])
def test_partial_rows_matches_scipy_rectangular(rng, n_valid, n):
    # Valid rows are a rectangular problem n_valid x n; padding rows are
    # skipped by the solver.
    cost = rng.normal(size=(n, n)).astype(np.float32) * 5.0
    cost[n_valid:, :] = PAD
    row_valid = np.zeros((n,), bool)
    row_valid[:n_valid] = True
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(row_valid)))
    ours = _total_cost_from_row_of_col(cost, out)
    if n_valid == 0:
        assert (out == -1).all()
        return
    ri, ci = linear_sum_assignment(cost[:n_valid, :])
    np.testing.assert_allclose(ours, cost[ri, ci].sum(), rtol=1e-5, atol=1e-4)
    # Exactly n_valid columns are matched.
    assert (out >= 0).sum() == n_valid


def test_padded_columns_do_not_steal_real_matches(rng):
    # 3 valid rows, 4 real columns, 4 pad columns at PAD cost: the optimum
    # must use only real columns.
    n = 8
    cost = np.full((n, n), PAD, np.float32)
    cost[:3, :4] = rng.normal(size=(3, 4)).astype(np.float32)
    row_valid = np.zeros((n,), bool)
    row_valid[:3] = True
    out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.asarray(row_valid)))
    matched_cols = [j for j, i in enumerate(out) if i >= 0]
    assert all(j < 4 for j in matched_cols)
    ri, ci = linear_sum_assignment(cost[:3, :4])
    np.testing.assert_allclose(
        _total_cost_from_row_of_col(cost, out),
        cost[:3, :4][ri, ci].sum(),
        rtol=1e-5,
        atol=1e-3,
    )


def test_batched_solver(rng):
    b, n = 6, 20
    costs = rng.normal(size=(b, n, n)).astype(np.float32) * 8.0
    valid = np.ones((b, n), bool)
    outs = np.asarray(
        hungarian_assign_batched(jnp.asarray(costs), jnp.asarray(valid))
    )
    for k in range(b):
        ri, ci = linear_sum_assignment(costs[k])
        np.testing.assert_allclose(
            _total_cost_from_row_of_col(costs[k], outs[k]),
            costs[k][ri, ci].sum(),
            rtol=1e-5,
            atol=1e-4,
        )


def test_ties_still_optimal():
    # Degenerate all-equal costs: any permutation is optimal.
    n = 10
    cost = np.ones((n, n), np.float32)
    out = np.asarray(
        hungarian_assign(jnp.asarray(cost), jnp.ones((n,), bool))
    )
    assert sorted(out.tolist()) == list(range(n))


def test_invert_assignment():
    row_of_col = jnp.asarray(np.array([2, -1, 0, 5], np.int32))
    col_of_row = np.asarray(invert_assignment(row_of_col, 4))
    np.testing.assert_array_equal(col_of_row, [2, -1, 0, -1])


def test_integer_costs_exact():
    # With small integer costs the optimum is unique up to ties; check exact
    # equality of totals.
    rng = np.random.default_rng(7)
    for _ in range(10):
        n = 12
        cost = rng.integers(0, 50, size=(n, n)).astype(np.float32)
        out = np.asarray(hungarian_assign(jnp.asarray(cost), jnp.ones((n,), bool)))
        ri, ci = linear_sum_assignment(cost)
        assert _total_cost_from_row_of_col(cost, out) == cost[ri, ci].sum()
