"""PP x TP composition on the three-axis ('data', 'stage', 'model')
mesh: the backbone pipeline's shard_map goes manual over (data, stage)
with 'model' left AUTO, so per-stage GEMMs auto-partition over the TP
axis and attention runs a nested shard_map bound to the context mesh.
Checked for exact agreement with the single-device path on the
8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from dinov2_od_tpu.config import MeshConfig, OptimConfig, TrainConfig
from dinov2_od_tpu.parallel import batch_sharding, create_mesh, shard_params
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from test_cp_tp import _batch, _tiny_detector

PP_TP_CFG = MeshConfig(model_parallel_size=2, pipeline_parallel_size=2)


@pytest.fixture(scope="module")
def mesh3():
    return create_mesh(model_parallel_size=2, cfg=PP_TP_CFG)


def test_mesh_axes(mesh3):
    assert dict(mesh3.shape) == {"data": 2, "stage": 2, "model": 2}


def test_mesh_config_validation():
    with pytest.raises(ValueError, match="exclusive"):
        MeshConfig(pipeline_parallel_size=2, pipeline_parallel=True)
    with pytest.raises(ValueError, match="exclusive"):
        MeshConfig(pipeline_parallel_size=2, context_parallel_size=2)
    with pytest.raises(ValueError, match="exclusive"):
        MeshConfig(pipeline_parallel_size=2, context_parallel=True)


def test_train_step_dp_pp_tp_matches_single_device(rng, mesh3):
    """One full train step under DP2 x PP2 x TP2 produces the same loss
    and updated params as the unsharded single-device step (the tiny
    backbone's depth 2 = one block per stage)."""
    det = _tiny_detector()
    cfg3 = TrainConfig(detector=det, optim=OptimConfig(), mesh=PP_TP_CFG)
    cfg1 = TrainConfig(detector=det, optim=OptimConfig())
    batch_np = _batch(rng, 4)

    params3 = shard_params(
        init_detector_params(jax.random.key(0), det), mesh3, cfg=PP_TP_CFG
    )
    tx3 = make_optimizer(cfg3.optim, det, params3)
    state3 = create_train_state(params3, cfg3.optim, det)
    step3 = make_train_step(cfg3, tx3, mesh=mesh3)
    bsh = batch_sharding(mesh3, cfg=PP_TP_CFG)
    batch3 = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch_np.items()}
    state3, m3 = step3(state3, batch3, jax.random.key(1))

    raw = init_detector_params(jax.random.key(0), det)
    tx1 = make_optimizer(cfg1.optim, det, raw)
    state1 = create_train_state(raw, cfg1.optim, det)
    step1 = make_train_step(cfg1, tx1)
    batch1 = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch1, jax.random.key(1))

    np.testing.assert_allclose(
        float(m3["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-5
    )
    for a, b_ in zip(
        jax.tree_util.tree_leaves(state3.params),
        jax.tree_util.tree_leaves(state1.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-5, atol=5e-5
        )


def test_param_shardings_megatron_under_pp(mesh3):
    """On the (data, stage, model) mesh, params keep the Megatron model
    specs — unlike legacy PP (model axis = stages), which replicates."""
    from dinov2_od_tpu.parallel.sharding import param_shardings

    det = _tiny_detector()
    params = init_detector_params(jax.random.key(0), det)
    sh = param_shardings(params, mesh3, cfg=PP_TP_CFG)
    assert sh["backbone"]["blocks"]["q"]["kernel"].spec == P(None, None, "model")
    assert sh["backbone"]["blocks"]["fc2"]["kernel"].spec == P(None, "model", None)


def test_pipeline_auto_axes_rejects_stage(mesh3):
    from dinov2_od_tpu.parallel.pipeline import pipeline_blocks

    with pytest.raises(ValueError, match="auto_axes"):
        pipeline_blocks(
            jnp.zeros((4, 8)),
            {"w": jnp.zeros((2, 8, 8))},
            lambda c, p: (c, None),
            mesh3,
            "stage",
            auto_axes=("stage",),
        )
