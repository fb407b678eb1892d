"""Checkpoint save/restore: roundtrip, shape-tolerant partial restore,
optimizer fallback, latest-checkpoint discovery."""

import numpy as np
import jax
import jax.numpy as jnp

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    OptimConfig,
)
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.train import create_train_state, make_optimizer
from dinov2_od_tpu.train.checkpoint import (
    latest_checkpoint,
    merge_compatible,
    restore_checkpoint,
    save_checkpoint,
    save_final_params,
)


def _cfg(num_queries=5):
    return DetectorConfig(
        backbone=BackboneConfig(variant="small", image_size=56, lora_r=1,
                                target_dim=32, depth_override=2),
        decoder=DecoderConfig(hidden_dim=32, num_queries=num_queries,
                              num_layers=1, num_heads=4, dim_feedforward=64,
                              num_classes=6),
    )


def test_roundtrip(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg)
    state = create_train_state(params, OptimConfig(), cfg)
    hist = {"epochs": [0], "train_loss": [1.5]}
    path = save_checkpoint(str(tmp_path), 3, state.params, state.opt_state, 1.5, hist)

    p2, opt2, start_epoch, hist2 = restore_checkpoint(
        path, params, state.opt_state
    )
    assert start_epoch == 4
    assert hist2 == hist
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shape_tolerant_restore(tmp_path):
    """Checkpoint from a 5-query model restored into an 8-query model:
    matching tensors load, mismatched ones keep init (reference
    train.py:711-739)."""
    cfg5, cfg8 = _cfg(5), _cfg(8)
    p5 = init_detector_params(jax.random.key(0), cfg5)
    s5 = create_train_state(p5, OptimConfig(), cfg5)
    path = save_checkpoint(str(tmp_path), 0, s5.params, s5.opt_state, 1.0)

    p8 = init_detector_params(jax.random.key(1), cfg8)
    s8_opt = make_optimizer(OptimConfig(), cfg8, p8).init(p8)
    merged, opt, start, _ = restore_checkpoint(path, p8, s8_opt)
    # Backbone tensors (same shape) come from the checkpoint.
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["cls_token"]),
        np.asarray(p5["backbone"]["cls_token"]),
    )
    # query_embed (shape mismatch 5 vs 8) keeps the new init.
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["query_embed"]),
        np.asarray(p8["decoder"]["query_embed"]),
    )
    # Optimizer state incompatible -> reset to template.
    assert opt is s8_opt


def test_merge_compatible_counts():
    t = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,))}
    r = {"a": jnp.ones((2, 2)), "b": jnp.ones((4,))}
    merged, loaded, skipped = merge_compatible(t, r)
    assert loaded == 1 and skipped == 1
    np.testing.assert_array_equal(np.asarray(merged["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["b"]), 0.0)


def test_final_params_and_latest(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg)
    state = create_train_state(params, OptimConfig(), cfg)
    save_checkpoint(str(tmp_path), 9, state.params, state.opt_state, 1.0)
    save_checkpoint(str(tmp_path), 19, state.params, state.opt_state, 0.5)
    save_final_params(str(tmp_path), state.params)
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_epoch_19")
    p, _, start, _ = restore_checkpoint(latest, params, None)
    assert start == 20


def test_async_save_roundtrip(tmp_path):
    """async_save returns before finalization; wait_for_saves (called by
    restore_checkpoint) must make the checkpoint durable, including the
    deferred metrics_history sidecar. Back-to-back async saves serialize
    (at most one in flight)."""
    import os

    from dinov2_od_tpu.train.checkpoint import wait_for_saves

    cfg = _cfg()
    params = init_detector_params(jax.random.key(1), cfg)
    state = create_train_state(params, OptimConfig(), cfg)
    hist = {"epochs": [0, 1], "train_loss": [2.0, 1.0]}
    p1 = save_checkpoint(str(tmp_path), 0, state.params, state.opt_state,
                         2.0, hist, async_save=True)
    # Immediately queue a second save: must wait out the first, not race.
    p2 = save_checkpoint(str(tmp_path), 1, state.params, state.opt_state,
                         1.0, hist, async_save=True)
    assert p1 != p2

    p_restored, _, start_epoch, hist2 = restore_checkpoint(p2, params, None)
    assert start_epoch == 2
    assert hist2 == hist
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p_restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The first save finalized too, with its sidecar in place.
    wait_for_saves()
    assert os.path.exists(os.path.join(p1, "metrics_history.json"))
    assert latest_checkpoint(str(tmp_path)) == p2
