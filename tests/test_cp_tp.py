"""CP x TP composition on the three-axis ('data', 'context', 'model')
mesh: ring attention sharded over BOTH tokens (context axis) and heads
(model axis), and the full train step under DP x CP x TP — all checked
for exact agreement with the single-device path on the 8-virtual-device
CPU mesh."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
)
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.ops.attention import _xla_attention, multi_head_attention
from dinov2_od_tpu.ops.ring_attention import ring_attention
from dinov2_od_tpu.parallel import batch_sharding, create_mesh, shard_params
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

CP_TP_CFG = MeshConfig(model_parallel_size=2, context_parallel_size=2)


@pytest.fixture(scope="module")
def mesh3():
    # 8 devices -> data 2 x context 2 x model 2.
    return create_mesh(model_parallel_size=2, cfg=CP_TP_CFG)


def test_mesh_axes(mesh3):
    assert dict(mesh3.shape) == {"data": 2, "context": 2, "model": 2}


def test_mesh_config_validation():
    with pytest.raises(ValueError, match="not both"):
        MeshConfig(context_parallel=True, context_parallel_size=2)
    with pytest.raises(ValueError, match="pipeline"):
        MeshConfig(context_parallel_size=2, pipeline_parallel=True)


def test_ring_head_sharded_forward_and_backward(rng, mesh3):
    """Ring attention with tokens over 'context' AND heads over 'model'
    matches full attention — forward and gradients."""
    b, s, h, d = 2, 64, 4, 8  # s: 2 context shards; h: 2 head shards
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        for _ in range(3)
    )
    scale = 1.0 / np.sqrt(d)
    sharding = NamedSharding(mesh3, P("data", "context", "model", None))
    qs, ks, vs = (jax.device_put(x, sharding) for x in (q, k, v))

    out = ring_attention(
        qs, ks, vs, scale=scale, mesh=mesh3, axis="context",
        batch_axis="data", head_axis="model",
    )
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    assert out.sharding.spec == P("data", "context", "model", None)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(
                q, k, v, scale=scale, mesh=mesh3, axis="context",
                batch_axis="data", head_axis="model",
            )
            ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g = jax.grad(loss_ring, argnums=(0, 1, 2))(qs, ks, vs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-5, atol=3e-5
        )


def test_mha_ring_accepts_tp_axis(rng, mesh3):
    """multi_head_attention(impl='ring', tp_axis=...) routes tp_axis to
    ring_attention's head_axis (including the pad-to-shard-multiple
    path: S=50 pads to 2 context shards of 25)."""
    b, s, h, d = 2, 50, 4, 8
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
        for _ in range(3)
    )
    out = multi_head_attention(
        q, k, v, impl="ring", mesh=mesh3, seq_axis="context",
        batch_axis="data", tp_axis="model",
    )
    ref = _xla_attention(q, k, v, 1.0 / np.sqrt(d))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def _tiny_detector():
    return DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=1,
            target_dim=64, hidden_dim_override=128, depth_override=2,
            num_heads_override=4, mlp_ratio_override=4.0,
        ),
        decoder=DecoderConfig(
            hidden_dim=64, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=128, num_classes=7, use_deformable=True,
            dropout=0.0,
        ),
    )


def _batch(rng, batch_size):
    return {
        "images": rng.normal(size=(batch_size, 56, 56, 3)).astype(np.float32),
        "boxes": rng.uniform(0.3, 0.6, size=(batch_size, 4, 4)).astype(
            np.float32
        ),
        "labels": rng.integers(0, 7, size=(batch_size, 4)).astype(np.int32),
        "valid": np.ones((batch_size, 4), bool),
    }


def test_train_step_dp_cp_tp_matches_single_device(rng, mesh3):
    """One full train step under DP2 x CP2 x TP2 produces the same loss
    and updated params as the unsharded single-device step."""
    det = _tiny_detector()
    cfg3 = TrainConfig(detector=det, optim=OptimConfig(), mesh=CP_TP_CFG)
    cfg1 = TrainConfig(detector=det, optim=OptimConfig())
    batch_np = _batch(rng, 4)

    # Sharded step. (Params are initialized separately per step: on the
    # CPU backend device_put can alias the source buffer, and the train
    # step DONATES its state — a shared init tree would be deleted.)
    params3 = shard_params(
        init_detector_params(jax.random.key(0), det), mesh3, cfg=CP_TP_CFG
    )
    tx3 = make_optimizer(cfg3.optim, det, params3)
    state3 = create_train_state(params3, cfg3.optim, det)
    step3 = make_train_step(cfg3, tx3, mesh=mesh3)
    bsh = batch_sharding(mesh3, cfg=CP_TP_CFG)
    batch3 = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch_np.items()}
    state3, m3 = step3(state3, batch3, jax.random.key(1))

    # Single-device step.
    raw = init_detector_params(jax.random.key(0), det)
    tx1 = make_optimizer(cfg1.optim, det, raw)
    state1 = create_train_state(raw, cfg1.optim, det)
    step1 = make_train_step(cfg1, tx1)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, jax.random.key(1))

    np.testing.assert_allclose(
        float(m3["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-5
    )
    flat3 = jax.tree_util.tree_leaves(state3.params)
    flat1 = jax.tree_util.tree_leaves(state1.params)
    for a, b_ in zip(flat3, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


def test_param_shardings_keep_megatron_specs_under_cp(mesh3):
    """On the three-axis mesh, params shard over 'model' (Megatron) and
    replicate over 'context' — unlike legacy CP, which replicates all."""
    from dinov2_od_tpu.parallel.sharding import param_shardings

    det = _tiny_detector()
    params = init_detector_params(jax.random.key(0), det)
    sh = param_shardings(params, mesh3, cfg=CP_TP_CFG)
    q_kernel = sh["backbone"]["blocks"]["q"]["kernel"]
    assert q_kernel.spec == P(None, None, "model")
    fc2_kernel = sh["backbone"]["blocks"]["fc2"]["kernel"]
    assert fc2_kernel.spec == P(None, "model", None)
