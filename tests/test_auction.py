"""Auction solver tests: validity, eps-optimality vs scipy, matcher
integration at COCO GT density."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from dinov2_od_tpu.config import LossConfig, MatcherConfig
from dinov2_od_tpu.ops.auction import auction_assign
from dinov2_od_tpu.ops.matching import PAD_COST, hungarian_match, matching_cost_matrix


def _padded_problem(rng, n, nv, scale=10.0):
    cost = (rng.normal(size=(n, n)) * scale).astype(np.float32)
    cost[nv:, :] = PAD_COST
    valid = np.zeros(n, bool)
    valid[:nv] = True
    # Auction-side pad clip (as the matcher does).
    real_max = cost[cost < PAD_COST].max() if nv else 0.0
    clipped = np.minimum(cost, real_max + 1.0)
    return cost, clipped, valid


@pytest.mark.parametrize("n,nv", [(8, 5), (50, 25), (100, 93), (100, 100), (64, 0)])
def test_auction_valid_permutation_and_near_optimal(n, nv):
    rng = np.random.default_rng(n * 1000 + nv)
    cost, clipped, valid = _padded_problem(rng, n, nv)
    out = np.asarray(auction_assign(jnp.asarray(clipped), jnp.asarray(valid)))

    assigned = out[out >= 0]
    assert len(set(assigned.tolist())) == len(assigned), "row assigned twice"
    assert valid[assigned].all(), "invalid row assigned"
    # Every valid row assigned exactly once.
    assert np.isin(np.where(valid)[0], assigned).all()

    if nv:
        ri, ci = linear_sum_assignment(cost)
        opt = sum(cost[r, c] for r, c in zip(ri, ci) if valid[r])
        tot = sum(cost[r, c] for c, r in enumerate(out) if r >= 0)
        # eps-optimality: within nv * eps * range of the optimum.
        rng_span = clipped.max() - clipped.min()
        assert tot <= opt + nv * 1e-3 * rng_span + 1e-3, (tot, opt)


def test_auction_no_valid_rows():
    cost = jnp.full((16, 16), PAD_COST)
    out = np.asarray(auction_assign(cost, jnp.zeros(16, bool)))
    assert (out == -1).all()


def test_auction_matches_scipy_on_realistic_matcher_costs():
    """Total cost parity with scipy on actual matching cost matrices at
    COCO density (Q=50, up to 93 valid GT in 100 slots)."""
    rng = np.random.default_rng(0)
    Q, G = 50, 100
    mc = MatcherConfig()
    for trial in range(4):
        gv = int(rng.integers(40, 94))
        logits = jnp.asarray(rng.normal(size=(Q, 91)).astype(np.float32))
        pb = jnp.asarray(
            np.clip(rng.uniform(0.1, 0.9, (Q, 4)) * [1, 1, 0.3, 0.3], 0.02, 1
                    ).astype(np.float32))
        gl = jnp.asarray(rng.integers(1, 91, size=(G,)).astype(np.int32))
        gb = jnp.asarray(
            np.clip(rng.uniform(0.1, 0.9, (G, 4)) * [1, 1, 0.3, 0.3], 0.02, 1
                    ).astype(np.float32))
        valid = np.arange(G) < gv
        cqg = np.asarray(matching_cost_matrix(
            logits, pb, gl, gb, jnp.asarray(valid), mc))

        n = max(Q, G)
        cost = np.full((n, n), PAD_COST, np.float32)
        cost[:G, :Q] = cqg.T
        rowv = np.zeros(n, bool)
        rowv[:G] = valid
        real_max = cost[cost < PAD_COST].max()
        clipped = np.minimum(cost, real_max + 1.0)

        out = np.asarray(auction_assign(jnp.asarray(clipped), jnp.asarray(rowv)))
        ri, ci = linear_sum_assignment(cost)
        opt = sum(cost[r, c] for r, c in zip(ri, ci) if rowv[r] and c < Q)
        tot = sum(cost[r, c] for c, r in enumerate(out) if r >= 0 and c < Q)
        #

        assert tot <= opt + 0.5, (trial, tot, opt)


def test_auction_near_duplicate_boxes_stays_near_optimal():
    """Adversarial case: 93 near-duplicate GT boxes produce massed
    near-tie costs that price-war a fixed-eps auction into tens of
    thousands of rounds (measured: up to 20k). The matcher's transposed
    construction (queries bid, eps-scaling in the square Q >= G case)
    must stay inside its round budget AND keep the optimality bound — if
    the budget were the binding factor, the greedy completion would blow
    the bound by orders of magnitude."""
    rng = np.random.default_rng(5)
    mc = MatcherConfig()
    for trial, Q in enumerate((100, 50, 100)):
        G = 100
        logits = jnp.asarray(rng.normal(size=(Q, 91)).astype(np.float32))
        pb = jax.nn.sigmoid(jnp.asarray(rng.normal(size=(Q, 4)).astype(np.float32)))
        gl = jnp.asarray(rng.integers(0, 6, size=(G,)).astype(np.int32))
        base = np.clip(rng.uniform(0.2, 0.8, (1, 4)), 0.05, 0.95)
        gb = jnp.asarray(np.clip(
            base + rng.normal(scale=0.01, size=(G, 4)), 0.02, 0.98
        ).astype(np.float32))
        valid = np.arange(G) < 93
        cqg = np.asarray(matching_cost_matrix(
            logits, pb, gl, gb, jnp.asarray(valid), mc))
        n = max(Q, G)
        # The matcher's transposed construction (matching.py).
        cost = np.full((Q, n), PAD_COST, np.float32)
        cost[:, :G] = cqg
        real_max = cqg[:, valid].max()
        clipped = np.minimum(cost, real_max + 1.0)
        col_pad = ~np.pad(valid, (0, n - G))
        out = np.asarray(auction_assign(
            jnp.asarray(clipped), jnp.ones(Q, bool), jnp.asarray(col_pad),
            scale_phases=(Q == n),
        ))

        # Each query assigned at most one column; every query assigned.
        assigned = out[out >= 0]
        assert len(set(assigned.tolist())) == len(assigned)
        assert len(assigned) == Q
        ri, ci = linear_sum_assignment(cqg[:, valid])
        opt = cqg[:, valid][ri, ci].sum()
        tot = sum(cqg[out[c], c] for c in range(G) if out[c] >= 0 and valid[c])
        nmatch = sum(1 for c in range(G) if out[c] >= 0 and valid[c])
        assert nmatch == min(Q, valid.sum())
        span = clipped.max() - clipped.min()
        assert tot <= opt + Q * 1e-3 * span + 0.1, (trial, tot, opt)


def test_matcher_auction_vs_jv_same_total_cost():
    """hungarian_match with assignment='auction' vs 'jv' at dense GT: the
    matched totals agree within the auction's eps slack, and both produce
    valid per-image matchings."""
    rng = np.random.default_rng(1)
    B, Q, G, C = 4, 50, 100, 91
    logits = jnp.asarray(rng.normal(size=(B, Q, C)).astype(np.float32))
    pb = jnp.asarray(
        np.clip(rng.uniform(0.1, 0.9, (B, Q, 4)) * [1, 1, 0.3, 0.3], 0.02, 1
                ).astype(np.float32))
    gl = jnp.asarray(rng.integers(1, C, size=(B, G)).astype(np.int32))
    gb = jnp.asarray(
        np.clip(rng.uniform(0.1, 0.9, (B, G, 4)) * [1, 1, 0.3, 0.3], 0.02, 1
                ).astype(np.float32))
    valid = jnp.asarray(np.arange(G)[None, :].repeat(B, 0) < 93)

    mc_jv = MatcherConfig(assignment="jv")
    mc_auc = MatcherConfig(assignment="auction")
    m_jv = hungarian_match(logits, pb, gl, gb, valid, mc_jv)
    m_auc = hungarian_match(logits, pb, gl, gb, valid, mc_auc)

    for b in range(B):
        cqg = np.asarray(matching_cost_matrix(
            logits[b], pb[b], gl[b], gb[b], valid[b], mc_jv))
        for res in (m_jv, m_auc):
            q = np.asarray(res.query_of_gt[b])
            mv = np.asarray(res.match_valid[b])
            # matched queries unique
            used = q[mv]
            assert len(set(used.tolist())) == len(used)
        tot_jv = sum(
            cqg[q, g] for g, q in enumerate(np.asarray(m_jv.query_of_gt[b]))
            if np.asarray(m_jv.match_valid[b])[g]
        )
        tot_auc = sum(
            cqg[q, g] for g, q in enumerate(np.asarray(m_auc.query_of_gt[b]))
            if np.asarray(m_auc.match_valid[b])[g]
        )
        # Same number of matches; totals within the eps slack.
        assert np.asarray(m_jv.match_valid[b]).sum() == np.asarray(m_auc.match_valid[b]).sum()
        span = cqg[np.isfinite(cqg)].max() - cqg.min()
        assert tot_auc <= tot_jv + 93 * 1e-3 * min(span, 100.0) + 0.1, (tot_jv, tot_auc)
