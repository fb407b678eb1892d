"""FSDP (ZeRO-3) parameter/optimizer sharding over the data axis.

Beyond-reference capability (the reference's DDP, train.py:677,
replicates params + Adam state on every GPU): MeshConfig.fsdp shards
every large parameter leaf — and, by zeros_like inheritance, its Adam
moments — over the mesh's 'data' axis. GSPMD inserts the
all-gather-on-use and gradient reduce-scatter, so the math must equal
plain DP exactly. These tests pin (a) the spec rules, (b) per-device
memory actually dropping, (c) train-step equality vs a single device,
(d) FSDP x TP composition, and (e) the CP/PP incompatibility guard.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
    MeshConfig,
    OptimConfig,
    TrainConfig,
)
from dinov2_od_tpu.data.synthetic import NUM_SYNTHETIC_CLASSES, make_batch
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.parallel import batch_sharding, create_mesh, shard_params
from dinov2_od_tpu.parallel.sharding import param_shardings
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)

FSDP = MeshConfig(fsdp=True)
FSDP_TP = MeshConfig(fsdp=True, model_parallel_size=2)


def _tiny_cfg():
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
    return TrainConfig(detector=det, optim=OptimConfig(learning_rate=3e-4))


def _batch(cfg, n=8, seed=0):
    b = make_batch(
        np.random.default_rng(seed), n,
        image_size=cfg.detector.backbone.image_size, max_boxes=6,
    )
    return {k: jnp.asarray(v) for k, v in b.items()}


class TestSpecs:
    def test_large_leaves_shard_over_data(self):
        cfg = _tiny_cfg()
        params = init_detector_params(jax.random.key(0), cfg.detector)
        mesh = create_mesh(cfg=FSDP)  # 8-way data
        sh = param_shardings(params, mesh, cfg=FSDP)
        blocks = sh["backbone"]["blocks"]
        # ViT-S block kernels [12, 384, 384] / [12, 384, 1536]: one linear
        # dim sharded over 'data'.
        assert "data" in tuple(blocks["q"]["kernel"].spec)
        assert "data" in tuple(blocks["fc1"]["kernel"].spec)
        # The leading depth (scan) axis must never shard.
        for lin in ("q", "fc1", "fc2", "proj"):
            spec = tuple(blocks[lin]["kernel"].spec)
            assert spec[0] is None, (lin, spec)
        # Tiny leaves (LN scales, biases) never pick up a 'data' shard
        # (their Megatron 'model' entries collapse at model size 1).
        assert "data" not in tuple(blocks["ln1"]["scale"].spec)
        assert "data" not in tuple(blocks["q"]["bias"].spec)

    def test_fsdp_composes_with_tp_specs(self):
        cfg = _tiny_cfg()
        params = init_detector_params(jax.random.key(0), cfg.detector)
        mesh = create_mesh(model_parallel_size=2, cfg=FSDP_TP)  # 4 x 2
        sh = param_shardings(params, mesh, cfg=FSDP_TP)
        blocks = sh["backbone"]["blocks"]
        # Column-parallel q kernel [12, 384, 384]: out dim on 'model'
        # (Megatron), in dim picked up by FSDP.
        assert tuple(blocks["q"]["kernel"].spec)[-1] == "model"
        assert tuple(blocks["q"]["kernel"].spec)[-2] == "data"
        # Row-parallel fc2 [12, 1536, 384]: in dim 'model', out dim 'data'.
        assert tuple(blocks["fc2"]["kernel"].spec)[-2] == "model"
        assert tuple(blocks["fc2"]["kernel"].spec)[-1] == "data"

    def test_indivisible_dims_skip_gracefully(self):
        mesh = create_mesh(cfg=FSDP)  # 8-way data
        # 1001x96: 1001 % 8 != 0 -> falls back to the other dim (96 % 8
        # == 0); 1001x97 with both indivisible -> replicated, no error.
        leaf_a = {"x": {"kernel": jnp.zeros((1001, 96))}}
        sh = param_shardings(leaf_a, mesh, cfg=FSDP)
        assert tuple(sh["x"]["kernel"].spec) == (None, "data")
        leaf_b = {"x": {"kernel": jnp.zeros((1001, 97))}}
        sh = param_shardings(leaf_b, mesh, cfg=FSDP)
        assert all(s is None for s in tuple(sh["x"]["kernel"].spec))

    def test_cp_pp_composition_raises(self):
        mesh = create_mesh(cfg=FSDP)
        leaf = {"x": jnp.zeros((8, 8))}
        for bad in (
            MeshConfig(fsdp=True, context_parallel=True),
            MeshConfig(fsdp=True, pipeline_parallel=True),
            MeshConfig(fsdp=True, context_parallel_size=2),
            MeshConfig(fsdp=True, pipeline_parallel_size=2),
        ):
            with pytest.raises(ValueError, match="fsdp"):
                param_shardings(leaf, mesh, cfg=bad)


class TestMemory:
    def test_param_and_adam_memory_shrink_per_device(self):
        """The point of ZeRO-3: per-device bytes for the sharded leaves
        are ~1/8 of the leaf, for params AND the Adam moments (which
        inherit the sharding through tx.init's zeros_like). The Adam
        check needs a large TRAINABLE leaf — the backbone kernels are
        frozen (masked out of Adam state) — so the decoder is widened."""
        import dataclasses

        cfg = _tiny_cfg()
        det = dataclasses.replace(
            cfg.detector,
            backbone=dataclasses.replace(
                cfg.detector.backbone, target_dim=256,
            ),
            decoder=dataclasses.replace(
                cfg.detector.decoder, hidden_dim=256, dim_feedforward=1024,
            ),
        )
        cfg = dataclasses.replace(cfg, detector=det)
        params = init_detector_params(jax.random.key(0), det)
        mesh = create_mesh(cfg=FSDP)
        sharded = shard_params(params, mesh, cfg=FSDP)
        kernel = sharded["backbone"]["blocks"]["fc1"]["kernel"]
        assert kernel.addressable_shards[0].data.size == kernel.size // 8
        state = create_train_state(sharded, cfg.optim, det)
        def data_sharded(leaf):
            spec = getattr(leaf.sharding, "spec", None) if isinstance(
                leaf, jax.Array
            ) else None
            return spec is not None and any(s == "data" for s in tuple(spec))

        big_sharded = [
            leaf
            for leaf in jax.tree_util.tree_leaves(state.opt_state)
            if data_sharded(leaf) and leaf.size >= 65536
        ]
        assert big_sharded, "no data-sharded Adam moment found"
        for mu in big_sharded:
            assert mu.addressable_shards[0].data.size < mu.size


class TestCheckpoint:
    def test_fsdp_sharded_state_roundtrips_through_orbax(self, tmp_path):
        """A checkpoint written from FSDP-sharded params + Adam state must
        restore bit-identically (orbax gathers the shards on save; the
        restore path re-shards via shard_params)."""
        from dinov2_od_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        cfg = _tiny_cfg()
        params = init_detector_params(jax.random.key(0), cfg.detector)
        mesh = create_mesh(cfg=FSDP)
        sharded = shard_params(params, mesh, cfg=FSDP)
        state = create_train_state(sharded, cfg.optim, cfg.detector)
        save_checkpoint(str(tmp_path), 3, state.params, state.opt_state, 1.0)

        tmpl = init_detector_params(jax.random.key(1), cfg.detector)
        tmpl_state = create_train_state(tmpl, cfg.optim, cfg.detector)
        restored, opt, start_epoch, _ = restore_checkpoint(
            str(tmp_path / "checkpoint_epoch_3"),
            tmpl,
            tmpl_state.opt_state,
        )
        assert start_epoch == 4
        re_sharded = shard_params(restored, mesh, cfg=FSDP)
        for a, b in zip(
            jax.tree_util.tree_leaves(sharded),
            jax.tree_util.tree_leaves(re_sharded),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEquality:
    def test_fsdp_train_step_matches_single_device(self):
        """One full step (fwd + Hungarian + bwd + Adam) under FSDP must
        match the unsharded step: FSDP changes layout, never math."""
        cfg = _tiny_cfg()
        params = init_detector_params(jax.random.key(0), cfg.detector)
        tx = make_optimizer(cfg.optim, cfg.detector, params)
        batch = _batch(cfg, n=8)
        rng = jax.random.key(7)
        copy = lambda p: jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), p
        )

        state_a = create_train_state(copy(params), cfg.optim, cfg.detector)
        state_a, ma = make_train_step(cfg, tx)(state_a, batch, rng)

        mesh = create_mesh(cfg=FSDP)
        step = make_train_step(cfg, tx, mesh=mesh)
        sharded = shard_params(copy(params), mesh, cfg=FSDP)
        state_b = create_train_state(sharded, cfg.optim, cfg.detector)
        bs = batch_sharding(mesh, cfg=FSDP)
        batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
        state_b, mb = step(state_b, batch_sh, rng)

        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=2e-4
        )
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5
            )

    def test_fsdp_tp_train_step_matches_single_device(self):
        cfg = _tiny_cfg()
        params = init_detector_params(jax.random.key(0), cfg.detector)
        tx = make_optimizer(cfg.optim, cfg.detector, params)
        batch = _batch(cfg, n=4)
        rng = jax.random.key(7)
        copy = lambda p: jax.tree_util.tree_map(
            lambda x: jnp.array(np.asarray(x)), p
        )

        state_a = create_train_state(copy(params), cfg.optim, cfg.detector)
        state_a, ma = make_train_step(cfg, tx)(state_a, batch, rng)

        mesh = create_mesh(model_parallel_size=2, cfg=FSDP_TP)
        step = make_train_step(cfg, tx, mesh=mesh)
        sharded = shard_params(copy(params), mesh, cfg=FSDP_TP)
        state_b = create_train_state(sharded, cfg.optim, cfg.detector)
        bs = batch_sharding(mesh, cfg=FSDP_TP)
        batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
        state_b, mb = step(state_b, batch_sh, rng)

        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=2e-4
        )
        la = jax.tree_util.tree_leaves(state_a.params)
        lb = jax.tree_util.tree_leaves(state_b.params)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5
            )
