"""LR schedules (beyond reference: train.py:1000-1004 has no scheduler):
schedule math, optimizer integration (warmup step 0 => zero update), and
reference-parity default (constant, no schedule transform)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import OptimConfig
from dinov2_od_tpu.train.state import lr_schedule_fn


def test_constant_no_warmup_is_none():
    assert lr_schedule_fn(OptimConfig(), 1e-4) is None


def test_unknown_schedule_rejected():
    with pytest.raises(ValueError, match="lr_schedule"):
        lr_schedule_fn(OptimConfig(lr_schedule="step"), 1e-4)


def test_cosine_schedule_values():
    cfg = OptimConfig(
        lr_schedule="cosine", warmup_steps=10, total_steps=110,
        min_lr_ratio=0.1,
    )
    s = lr_schedule_fn(cfg, 1e-3)
    assert float(s(0)) == pytest.approx(0.0, abs=1e-12)
    assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
    # Midpoint of the cosine sits between floor and peak.
    assert 1e-4 < float(s(60)) < 1e-3
    assert float(s(110)) == pytest.approx(1e-4, rel=1e-5)


def test_linear_schedule_values():
    cfg = OptimConfig(lr_schedule="linear", warmup_steps=0, total_steps=100)
    s = lr_schedule_fn(cfg, 1e-3)
    assert float(s(0)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(50)) == pytest.approx(5e-4, rel=1e-4)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-10)


def test_constant_with_warmup():
    cfg = OptimConfig(lr_schedule="constant", warmup_steps=4, total_steps=0)
    s = lr_schedule_fn(cfg, 2e-4)
    assert float(s(0)) == 0.0
    assert float(s(2)) == pytest.approx(1e-4, rel=1e-6)
    assert float(s(1000)) == pytest.approx(2e-4, rel=1e-6)


def test_warmup_step0_gives_zero_update(rng):
    """With warmup, the first optimizer step has LR 0: trainable params
    must not move (and the schedule count advances, so step 2 does)."""
    from test_cp_tp import _batch, _tiny_detector
    from dinov2_od_tpu.config import TrainConfig
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    det = _tiny_detector()
    optim = OptimConfig(lr_schedule="cosine", warmup_steps=3, total_steps=10)
    cfg = TrainConfig(detector=det, optim=optim)
    params = init_detector_params(jax.random.key(0), det)
    before = jax.tree_util.tree_map(np.asarray, params)
    tx = make_optimizer(optim, det, params)
    state = create_train_state(params, optim, det)
    step = make_train_step(cfg, tx)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, 2).items()}

    state, _ = step(state, batch, jax.random.key(1))
    after1 = jax.tree_util.tree_map(np.asarray, state.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after1)
    ):
        np.testing.assert_array_equal(a, b)

    state, _ = step(state, batch, jax.random.key(1))
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(
            jax.tree_util.tree_leaves(after1),
            jax.tree_util.tree_leaves(state.params),
        )
    )
    assert moved, "second step (warmup LR > 0) must update params"
