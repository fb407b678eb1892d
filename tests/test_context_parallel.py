"""Context parallelism wired end-to-end: the backbone runs ring attention
with the token dim sharded over the mesh's model axis
(MeshConfig.context_parallel), and matches the single-path forward
exactly. This is the config-level wiring for ops/ring_attention.py — the
capability the reference has no equivalent of (its attention is a single
cuDNN SDPA call, dinov2_backbone.py:60)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import (
    DataConfig,
    MatcherConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
    lightweight_detector_config,
)
from dinov2_od_tpu.data.synthetic import make_batch
from dinov2_od_tpu.models import detector_apply, init_detector_params
from dinov2_od_tpu.parallel import create_mesh, shard_params
from dinov2_od_tpu.train import create_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def cfg():
    det = lightweight_detector_config(image_size=56)
    # 56/14 = 4x4 = 16 tokens (CLS dropped): divides the 4-way model axis.
    assert det.backbone.drop_cls_token
    return det


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(model_parallel_size=4)  # ('data': 2, 'model': 4)


def test_backbone_forward_matches_plain(cfg, mesh):
    rng = np.random.default_rng(0)
    params = init_detector_params(jax.random.key(0), cfg)
    images = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))

    plain = detector_apply(params, cfg, images, deterministic=True,
                           attn_impl="xla")
    ring = detector_apply(params, cfg, images, deterministic=True,
                          attn_impl="ring", mesh=mesh, seq_axis="model")
    np.testing.assert_allclose(
        np.asarray(ring["pred_boxes"]), np.asarray(plain["pred_boxes"]),
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ring["pred_logits"]), np.asarray(plain["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.slow
def test_train_step_under_context_parallel_matches_plain(cfg, mesh):
    """One full train step with context_parallel=True equals the plain
    single-device step (same loss, same updated params)."""
    tc_plain = TrainConfig(
        detector=cfg,
        data=DataConfig(batch_size=2, image_size=56, max_boxes=8),
        optim=OptimConfig(),
        matcher=MatcherConfig(),
    )
    tc_cp = dataclasses.replace(
        tc_plain, mesh=MeshConfig(model_parallel_size=4, context_parallel=True)
    )

    raw = make_batch(np.random.default_rng(1), 2, image_size=56, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    def run(tc, mesh_arg):
        params = init_detector_params(jax.random.key(0), cfg)
        if mesh_arg is not None:
            params = shard_params(params, mesh_arg, cfg=tc.mesh)
        tx = make_optimizer(tc.optim, cfg, params)
        state = create_train_state(params, tc.optim, cfg)
        step = make_train_step(tc, tx, mesh=mesh_arg)
        new_state, metrics = step(state, batch, jax.random.key(2))
        return new_state, metrics

    _, m_plain = run(tc_plain, None)
    st_cp, m_cp = run(tc_cp, mesh)

    np.testing.assert_allclose(
        float(m_cp["loss"]), float(m_plain["loss"]), rtol=1e-5
    )
    assert np.isfinite(float(m_cp["grad_norm"]))


def test_ring_pads_non_divisible_sequence(mesh):
    """65 tokens (CLS + 8x8 patches) on a 4-way axis: the dispatch pads to
    68, masks the 3 pad keys, and slices back — exact vs XLA."""
    from dinov2_od_tpu.ops.attention import _xla_attention, multi_head_attention

    rng = np.random.default_rng(3)
    q, k, v = (
        jnp.asarray(rng.normal(size=(2, 65, 2, 16)).astype(np.float32))
        for _ in range(3)
    )
    out = multi_head_attention(q, k, v, impl="ring", mesh=mesh,
                               seq_axis="model")
    ref = _xla_attention(q, k, v, 1.0 / np.sqrt(16))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_ring_rejects_cross_attention(mesh):
    q = jnp.zeros((2, 64, 2, 16))
    kv = jnp.zeros((2, 32, 2, 16))
    with pytest.raises(ValueError, match="self-attention"):
        from dinov2_od_tpu.ops.attention import multi_head_attention
        multi_head_attention(q, kv, kv, impl="ring", mesh=mesh,
                             seq_axis="model")
