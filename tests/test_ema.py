"""Weight EMA (beyond reference): placeholder structure (frozen leaves
not duplicated), EMA math across train steps, merge semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from dinov2_od_tpu.config import OptimConfig, TrainConfig
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.models.detector import trainable_mask
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from dinov2_od_tpu.train.state import init_ema, merge_ema
from test_cp_tp import _batch, _tiny_detector


def test_ema_tree_structure_and_placeholders():
    det = _tiny_detector()
    params = init_detector_params(jax.random.key(0), det)
    ema = init_ema(params, det)
    mask = trainable_mask(params, det)
    for p, e, m in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(ema),
        jax.tree_util.tree_leaves(mask),
    ):
        if m:
            assert e.shape == p.shape
            np.testing.assert_array_equal(np.asarray(e), np.asarray(p))
        else:
            assert e.shape == ()  # frozen leaf not duplicated

    merged = merge_ema(params, ema, det)
    for p, g in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)
    ):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(g))


def test_ema_tracks_trainable_updates(rng):
    """After two steps: ema = d^2*p0 + d(1-d)*p1 + (1-d)*p2 per trainable
    leaf; frozen placeholders untouched; off -> state.ema is None."""
    det = _tiny_detector()
    d = 0.9
    optim = OptimConfig(ema_decay=d)
    cfg = TrainConfig(detector=det, optim=optim)
    params = init_detector_params(jax.random.key(0), det)
    p_hist = [jax.tree_util.tree_map(np.asarray, params)]
    tx = make_optimizer(optim, det, params)
    state = create_train_state(params, optim, det)
    step = make_train_step(cfg, tx)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, 2).items()}

    for i in range(2):
        state, _ = step(state, batch, jax.random.key(i))
        p_hist.append(jax.tree_util.tree_map(np.asarray, state.params))

    mask = trainable_mask(p_hist[0], det)
    expected = jax.tree_util.tree_map(
        lambda p0, p1, p2: d * (d * p0 + (1 - d) * p1) + (1 - d) * p2,
        *p_hist,
    )
    for e, x, m in zip(
        jax.tree_util.tree_leaves(state.ema),
        jax.tree_util.tree_leaves(expected),
        jax.tree_util.tree_leaves(mask),
    ):
        if m:
            np.testing.assert_allclose(
                np.asarray(e), x, rtol=1e-5, atol=1e-6
            )
        else:
            assert e.shape == ()

    # EMA differs from the live weights (it lags).
    moved = any(
        m and not np.array_equal(np.asarray(e), p)
        for e, p, m in zip(
            jax.tree_util.tree_leaves(state.ema),
            jax.tree_util.tree_leaves(p_hist[-1]),
            jax.tree_util.tree_leaves(mask),
        )
    )
    assert moved

    # Off by default.
    state0 = create_train_state(
        init_detector_params(jax.random.key(0), det), OptimConfig(), det
    )
    assert state0.ema is None
