"""OptimConfig.skip_nonfinite: a step with NaN/Inf gradients must leave
params, Adam moments, and the EMA untouched (reference train.py:1101
applies whatever backward produced — this guard is beyond reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    OptimConfig,
    TrainConfig,
)
from dinov2_od_tpu.data.synthetic import NUM_SYNTHETIC_CLASSES, make_batch
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)


def _cfg(ema_decay=0.0):
    det = DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=1,
            target_dim=32,
        ),
        decoder=DecoderConfig(
            hidden_dim=32, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
            use_deformable=True, dropout=0.0,
        ),
    )
    return TrainConfig(
        detector=det,
        optim=OptimConfig(skip_nonfinite=True, ema_decay=ema_decay),
    )


def _batch(cfg, n=2, seed=0, poison=False):
    b = make_batch(
        np.random.default_rng(seed), n,
        image_size=cfg.detector.backbone.image_size, max_boxes=6,
    )
    if poison:
        # NaN pixels propagate through the forward into every gradient.
        b["images"] = b["images"].copy()
        b["images"][0, 0, 0, :] = np.nan
    return {k: jnp.asarray(v) for k, v in b.items()}


def _snap(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def _assert_tree_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nan_gradients_skip_params_and_moments():
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)

    # One clean step first so the Adam moments are non-trivial.
    state, m = step(state, _batch(cfg), jax.random.key(1))
    assert float(m["nonfinite_skip"]) == 0.0
    p_before = _snap(state.params)
    o_before = _snap(state.opt_state)
    step_before = int(state.step)

    state, m = step(state, _batch(cfg, poison=True), jax.random.key(1))
    assert float(m["nonfinite_skip"]) == 1.0
    _assert_tree_equal(p_before, state.params)
    _assert_tree_equal(o_before, state.opt_state)
    # step/rng still advance: the poisoned batch is not resampled.
    assert int(state.step) == step_before + 1

    # And training continues normally afterwards.
    state, m = step(state, _batch(cfg), jax.random.key(1))
    assert float(m["nonfinite_skip"]) == 0.0
    assert np.isfinite(float(m["loss"]))
    moved = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(p_before),
            jax.tree_util.tree_leaves(_snap(state.params)),
        )
    )
    assert moved > 0


def test_clean_steps_update_with_guard_enabled():
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    p0 = np.asarray(state.params["decoder"]["class_embed"]["kernel"])
    state, m = step(state, _batch(cfg), jax.random.key(0))
    assert float(m["nonfinite_skip"]) == 0.0
    p1 = np.asarray(state.params["decoder"]["class_embed"]["kernel"])
    assert np.abs(p1 - p0).sum() > 0


def test_skip_preserves_ema():
    cfg = _cfg(ema_decay=0.9)
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    state, _ = step(state, _batch(cfg), jax.random.key(1))
    ema_before = _snap(state.ema)
    state, m = step(state, _batch(cfg, poison=True), jax.random.key(1))
    assert float(m["nonfinite_skip"]) == 1.0
    _assert_tree_equal(ema_before, state.ema)


def test_cli_flag_round_trip():
    from dinov2_od_tpu.train.cli import build_arg_parser

    p = build_arg_parser()
    assert p.parse_args(["--skip_nonfinite"]).skip_nonfinite is True
    assert p.parse_args([]).skip_nonfinite is False
