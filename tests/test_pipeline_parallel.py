"""Pipeline parallelism (parallel/pipeline.py + MeshConfig.pipeline_parallel):
the backbone depth streams over the model axis GPipe-style and must match
the sequential scan exactly — forward and through a full train step.
The reference has no pipeline capability (single-GPU DDP, SURVEY.md §2c).
"""

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
from dinov2_od_tpu.parallel.pipeline import pipeline_blocks
from dinov2_od_tpu.train import create_train_state, make_optimizer, make_train_step


@pytest.fixture(scope="module")
def cfg():
    return lightweight_detector_config(image_size=56)  # ViT-S: depth 12


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(model_parallel_size=4)  # ('data': 2, 'model': 4)


def test_pipeline_blocks_matches_sequential(mesh):
    """Unit: a stack of affine 'blocks' through the pipeline equals the
    sequential scan, including gradients."""
    L, B, D = 8, 4, 16
    rng = np.random.default_rng(0)
    ws = jnp.asarray(rng.normal(size=(L, D, D)).astype(np.float32) * 0.1)
    bs = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    params = {"w": ws, "b": bs}

    def block_fn(c, p):
        return jnp.tanh(c @ p["w"] + p["b"]), None

    seq, _ = jax.lax.scan(block_fn, x, params)
    pp = pipeline_blocks(x, params, block_fn, mesh, "model", 2)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(seq), rtol=1e-6, atol=1e-6)

    # Forward-only bubble skipping (lax.cond liveness) is exact too.
    pp_skip = pipeline_blocks(
        x, params, block_fn, mesh, "model", 2, skip_bubbles=True
    )
    np.testing.assert_allclose(
        np.asarray(pp_skip), np.asarray(seq), rtol=1e-6, atol=1e-6
    )

    def loss_seq(params, x):
        out, _ = jax.lax.scan(block_fn, x, params)
        return jnp.sum(out ** 2)

    def loss_pp(params, x):
        return jnp.sum(pipeline_blocks(x, params, block_fn, mesh, "model", 2) ** 2)

    g_seq = jax.grad(loss_seq)(params, x)
    g_pp = jax.grad(loss_pp)(params, x)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]), rtol=2e-5, atol=2e-5
        )


@pytest.mark.parametrize("v,m", [(2, 4), (2, 8), (4, 4)])
def test_interleaved_schedule_matches_sequential(mesh, v, m):
    """The interleaved (multi-chunk) schedule — device p holds chunks
    {p, P+p, ...} and microbatches lap the ring v times — is exact vs the
    sequential scan, forward and gradients, for several (chunks,
    microbatches) shapes. Bubble is (P-1) chunk-ticks vs GPipe's
    v*(P-1)."""
    L, B, D = 16, 16, 16
    rng = np.random.default_rng(3)
    ws = jnp.asarray(rng.normal(size=(L, D, D)).astype(np.float32) * 0.1)
    bs = jnp.asarray(rng.normal(size=(L, D)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    params = {"w": ws, "b": bs}

    def block_fn(c, p):
        return jnp.tanh(c @ p["w"] + p["b"]), None

    seq, _ = jax.lax.scan(block_fn, x, params)
    pp = pipeline_blocks(
        x, params, block_fn, mesh, "model", m, num_chunks=v
    )
    np.testing.assert_allclose(
        np.asarray(pp), np.asarray(seq), rtol=1e-6, atol=1e-6
    )

    pp_skip = pipeline_blocks(
        x, params, block_fn, mesh, "model", m, num_chunks=v,
        skip_bubbles=True,
    )
    np.testing.assert_allclose(
        np.asarray(pp_skip), np.asarray(seq), rtol=1e-6, atol=1e-6
    )

    def loss_seq(params, x):
        out, _ = jax.lax.scan(block_fn, x, params)
        return jnp.sum(out ** 2)

    def loss_pp(params, x):
        return jnp.sum(
            pipeline_blocks(
                x, params, block_fn, mesh, "model", m, num_chunks=v
            ) ** 2
        )

    g_seq = jax.grad(loss_seq)(params, x)
    g_pp = jax.grad(loss_pp)(params, x)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]), rtol=2e-5, atol=2e-5
        )


def test_interleaved_rejects_bad_microbatches(mesh):
    """v > 1 requires microbatches divisible by the stage count (the
    schedule injects microbatches in groups of P)."""
    x = jnp.zeros((8, 8))
    params = {"w": jnp.zeros((8, 8, 8))}

    def block_fn(c, p):
        return c @ p["w"], None

    with pytest.raises(ValueError, match="divisible by"):
        pipeline_blocks(
            x, params, block_fn, mesh, "model", 2, num_chunks=2
        )


def test_pipeline_backbone_forward_matches_plain(cfg, mesh):
    rng = np.random.default_rng(1)
    params = init_detector_params(jax.random.key(0), cfg)
    images = jnp.asarray(rng.uniform(0, 1, (4, 56, 56, 3)).astype(np.float32))

    plain = detector_apply(params, cfg, images, deterministic=True,
                           attn_impl="xla")
    pp = detector_apply(params, cfg, images, deterministic=True,
                        attn_impl="xla", mesh=mesh, pipe_axis="model",
                        pipe_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(pp["pred_logits"]), np.asarray(plain["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pp["pred_boxes"]), np.asarray(plain["pred_boxes"]),
        rtol=2e-5, atol=2e-5,
    )


def test_interleaved_backbone_forward_matches_plain(cfg, mesh):
    """ViT-S depth 12 over 4 stages x 3 chunks (each device holds blocks
    {p, 4+p, 8+p}) through the real detector forward."""
    rng = np.random.default_rng(4)
    params = init_detector_params(jax.random.key(0), cfg)
    images = jnp.asarray(rng.uniform(0, 1, (8, 56, 56, 3)).astype(np.float32))

    plain = detector_apply(params, cfg, images, deterministic=True,
                           attn_impl="xla")
    pp = detector_apply(params, cfg, images, deterministic=True,
                        attn_impl="xla", mesh=mesh, pipe_axis="model",
                        pipe_microbatches=4, pipe_chunks=3)
    np.testing.assert_allclose(
        np.asarray(pp["pred_logits"]), np.asarray(plain["pred_logits"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pp["pred_boxes"]), np.asarray(plain["pred_boxes"]),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.slow
def test_train_step_under_pipeline_matches_plain(cfg, mesh):
    tc_plain = TrainConfig(
        detector=cfg,
        data=DataConfig(batch_size=4, image_size=56, max_boxes=8),
        optim=OptimConfig(),
        matcher=MatcherConfig(),
    )
    tc_pp = dataclasses.replace(
        tc_plain,
        mesh=MeshConfig(model_parallel_size=4, pipeline_parallel=True,
                        pipeline_microbatches=2),
    )
    raw = make_batch(np.random.default_rng(2), 4, image_size=56, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    def run(tc, mesh_arg):
        params = init_detector_params(jax.random.key(0), cfg)
        if mesh_arg is not None:
            params = shard_params(params, mesh_arg, cfg=tc.mesh)
        tx = make_optimizer(tc.optim, cfg, params)
        state = create_train_state(params, tc.optim, cfg)
        step = make_train_step(tc, tx, mesh=mesh_arg)
        return step(state, batch, jax.random.key(3))

    _, m_plain = run(tc_plain, None)
    _, m_pp = run(tc_pp, mesh)
    np.testing.assert_allclose(
        float(m_pp["loss"]), float(m_plain["loss"]), rtol=1e-5
    )
    assert np.isfinite(float(m_pp["grad_norm"]))


def test_pipeline_rejects_bad_shapes(mesh):
    x = jnp.zeros((4, 8))
    params = {"w": jnp.zeros((6, 8, 8))}  # depth 6 % 4 stages != 0

    def block_fn(c, p):
        return c @ p["w"], None

    with pytest.raises(ValueError, match="divisible"):
        pipeline_blocks(x, params, block_fn, mesh, "model")
    params = {"w": jnp.zeros((8, 8, 8))}
    with pytest.raises(ValueError, match="divisible"):
        pipeline_blocks(jnp.zeros((5, 8)), params, block_fn, mesh, "model", 4)
