"""Train-step integration: overfit harness, DP/TP sharding equivalence,
frozen-param policy, gradient accumulation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    OptimConfig,
    TrainConfig,
)
from dinov2_od_tpu.data.synthetic import NUM_SYNTHETIC_CLASSES, make_batch
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.parallel import (
    batch_sharding,
    create_mesh,
    shard_params,
)
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from dinov2_od_tpu.train.state import TrainState


def _tiny_train_cfg(use_deformable=True, accum=1, lr=3e-4):
    det = DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=1,
            target_dim=32,
        ),
        decoder=DecoderConfig(
            hidden_dim=32, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
            use_deformable=use_deformable, dropout=0.0,
        ),
    )
    return TrainConfig(
        detector=det,
        optim=OptimConfig(learning_rate=lr, gradient_accumulation_steps=accum),
    )


def _small_trainable_cfg():
    """A config where the decoder can actually learn fast on CPU: backbone
    is random+frozen but the decoder still sees patch colors."""
    return _tiny_train_cfg(use_deformable=True)


def _batch(cfg, n=4, seed=0):
    b = make_batch(
        np.random.default_rng(seed), n,
        image_size=cfg.detector.backbone.image_size, max_boxes=6,
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


def test_overfit_loss_decreases():
    """The `--debug` harness semantics (reference train.py:50-84): loss on a
    small fixed batch must drop substantially under repeated steps."""
    cfg = _small_trainable_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg, n=4)
    rng = jax.random.key(42)

    state, m0 = step(state, batch, rng)
    first = float(m0["loss"])
    for _ in range(60):
        state, m = step(state, batch, rng)
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < 0.6 * first, f"loss did not drop: {first} -> {last}"


def test_frozen_params_unchanged_adapted_lora_changes():
    cfg = _small_trainable_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(3):
        state, _ = step(state, batch, jax.random.key(1))
    p1 = jax.tree_util.tree_map(np.asarray, state.params)

    # Frozen backbone base weights identical.
    np.testing.assert_array_equal(
        p0["backbone"]["patch_embed"]["kernel"],
        p1["backbone"]["patch_embed"]["kernel"],
    )
    np.testing.assert_array_equal(
        p0["backbone"]["blocks"]["q"]["kernel"],
        p1["backbone"]["blocks"]["q"]["kernel"],
    )
    # Decoder moved.
    assert np.abs(
        p0["decoder"]["class_embed"]["kernel"]
        - p1["decoder"]["class_embed"]["kernel"]
    ).sum() > 0
    # LoRA: only last-N blocks' adapters move.
    depth = cfg.detector.backbone.depth
    n_adapted = cfg.detector.backbone.lora_last_n_blocks
    dB0 = p0["backbone"]["blocks"]["q"]["lora_B"]
    dB1 = p1["backbone"]["blocks"]["q"]["lora_B"]
    per_block_delta = np.abs(dB1 - dB0).reshape(depth, -1).sum(1)
    assert (per_block_delta[: depth - n_adapted] == 0).all()
    assert (per_block_delta[depth - n_adapted :] > 0).all()
    # Projection trains (reference quirk: created before freeze loop,
    # dinov2_backbone.py:33-41).
    assert np.abs(
        p0["backbone"]["projection"]["kernel"]
        - p1["backbone"]["projection"]["kernel"]
    ).sum() > 0


def test_dp_sharded_step_matches_single_device():
    cfg = _tiny_train_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg, n=8)
    rng = jax.random.key(7)

    # Single-device reference. (Steps donate their input state, so each
    # sub-case gets its own copy of the initial params.)
    copy = lambda p: jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), p)
    state_a = create_train_state(copy(params), cfg.optim, cfg.detector)
    state_a, ma = step(state_a, batch, rng)

    # 8-way data parallel.
    mesh = create_mesh(model_parallel_size=1)
    sharded_params = shard_params(copy(params), mesh)
    state_b = create_train_state(sharded_params, cfg.optim, cfg.detector)
    bs = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    state_b, mb = step(state_b, batch_sh, rng)

    np.testing.assert_allclose(
        float(ma["loss"]), float(mb["loss"]), rtol=2e-4
    )
    # Updated params agree. atol covers fp32 reduction-order noise on
    # ~1e-6-scale deltas (8-way psum vs single-device sum); dropout masks
    # themselves are sharding-invariant (threefry_partitionable).
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5)


def test_dp_tp_sharded_step_matches_single_device():
    cfg = _tiny_train_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg, n=4)
    rng = jax.random.key(7)

    copy = lambda p: jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), p)
    state_a = create_train_state(copy(params), cfg.optim, cfg.detector)
    state_a, ma = step(state_a, batch, rng)

    # 2-way DP x 4-way TP.
    mesh = create_mesh(model_parallel_size=4)
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4
    sharded_params = shard_params(copy(params), mesh)
    state_b = create_train_state(sharded_params, cfg.optim, cfg.detector)
    bs = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    state_b, mb = step(state_b, batch_sh, rng)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=2e-4)


def test_gradient_accumulation_updates_every_n():
    cfg = _tiny_train_cfg(accum=2)
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    state = create_train_state(params, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg)
    p0 = np.asarray(state.params["decoder"]["class_embed"]["kernel"])
    state, _ = step(state, batch, jax.random.key(0))
    p1 = np.asarray(state.params["decoder"]["class_embed"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update yet
    state, _ = step(state, batch, jax.random.key(0))
    p2 = np.asarray(state.params["decoder"]["class_embed"]["kernel"])
    assert np.abs(p2 - p0).sum() > 0  # second micro-step applies


def test_check_tp_compatible():
    from dinov2_od_tpu.parallel.sharding import check_tp_compatible

    cfg = _tiny_train_cfg()
    check_tp_compatible(cfg.detector, 1)   # no-op
    # backbone 'small': 6 heads -> tp=2 divides everything (6, 384, 1536,
    # decoder 4 heads / 32 / 64).
    check_tp_compatible(cfg.detector, 2)
    with pytest.raises(ValueError, match="num_heads"):
        check_tp_compatible(cfg.detector, 4)  # backbone heads=6 % 4 != 0


def test_tp_shards_decoder_and_deformable_projections():
    """Decoder attention out-projections and deformable value/output
    projections must carry 'model'-axis specs (not stay replicated)."""
    from dinov2_od_tpu.parallel.sharding import param_shardings

    cfg = _tiny_train_cfg(use_deformable=True)
    params = init_detector_params(jax.random.key(0), cfg.detector)
    mesh = create_mesh(model_parallel_size=4)
    sh = param_shardings(params, mesh)

    layers = sh["decoder"]["layers"]
    out_spec = layers["self_attn"]["out"]["kernel"].spec
    assert "model" in tuple(out_spec), out_spec
    dv = layers["deform"]["value_kernel"].spec
    do = layers["deform"]["output_kernel"].spec
    # value: column-parallel (last dim), output: row-parallel (2nd-last dim)
    assert dv[-1] == "model", dv
    assert do[-2] == "model", do
    # offsets stay replicated
    assert all(s is None for s in layers["deform"]["offsets_kernel"].spec)


def test_dp_tp_standard_decoder_matches_single_device():
    """DP x TP equality through the *standard* (non-deformable) decoder
    path, exercising the row-parallel cross/self attention out projections."""
    cfg = _tiny_train_cfg(use_deformable=False)
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    step = make_train_step(cfg, tx)
    batch = _batch(cfg, n=4)
    rng = jax.random.key(7)

    copy = lambda p: jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), p)
    state_a = create_train_state(copy(params), cfg.optim, cfg.detector)
    state_a, ma = step(state_a, batch, rng)

    mesh = create_mesh(model_parallel_size=4)
    sharded_params = shard_params(copy(params), mesh)
    state_b = create_train_state(sharded_params, cfg.optim, cfg.detector)
    bs = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    state_b, mb = step(state_b, batch_sh, rng)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=2e-4)
