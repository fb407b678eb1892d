"""Device-cache + multi-step dispatch: trajectory equality vs the
per-step path, cached eval equality vs evaluate_dataset, schedule
equivalence with the DataLoader, CLI integration."""

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
from dinov2_od_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
)
from dinov2_od_tpu.train.device_cache import (
    epoch_index_groups,
    make_cached_eval,
    make_multi_train_step,
    upload_eval_cache,
    upload_train_cache,
)


def _tiny_cfg(ema=0.0):
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
        optim=OptimConfig(learning_rate=3e-4, ema_decay=ema),
    )


def _cache(cfg, n=16, seed=0):
    b = make_batch(
        np.random.default_rng(seed), n,
        image_size=cfg.detector.backbone.image_size, max_boxes=6,
    )
    # uint8 feed, like the packed path.
    images = (np.clip(b["images"], 0, 1) * 255).astype(np.uint8)
    return {
        "images": jnp.asarray(images),
        "boxes": jnp.asarray(b["boxes"]),
        "labels": jnp.asarray(b["labels"]),
        "valid": jnp.asarray(b["valid"]),
    }


def test_multi_step_matches_sequential_steps():
    """K scanned steps == K individually dispatched steps: identical
    params, opt state, and per-step losses (same rng fold by state.step)."""
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    cache = _cache(cfg)
    rng = jax.random.key(7)
    idxs = jnp.asarray(
        np.random.default_rng(1).integers(0, 16, size=(3, 4)), jnp.int32
    )

    # Deep-copy BEFORE running: multi() donates state_a, deleting the
    # buffers `params` holds.
    params_b = jax.tree.map(jnp.array, params)

    state_a = create_train_state(params, cfg.optim, cfg.detector)
    multi = make_multi_train_step(cfg, tx)
    state_a, stacked = multi(state_a, cache, idxs, rng)

    state_b = create_train_state(params_b, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    seq_losses = []
    for k in range(idxs.shape[0]):
        batch = {key: cache[key][idxs[k]] for key in cache}
        state_b, m = step(state_b, batch, rng)
        seq_losses.append(float(m["loss"]))

    np.testing.assert_allclose(
        np.asarray(stacked["loss"]), seq_losses, rtol=1e-5
    )
    assert int(state_a.step) == int(state_b.step)
    for la, lb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-5, atol=2e-6
        )


def test_multi_step_ema_and_augment_parity():
    """The scanned body carries EMA and augmentation identically."""
    import dataclasses

    cfg = _tiny_cfg(ema=0.9)
    cfg = dataclasses.replace(
        cfg,
        augment=dataclasses.replace(
            cfg.augment, hflip_prob=0.5, color_jitter=0.2
        ),
    )
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    cache = _cache(cfg)
    rng = jax.random.key(3)
    idxs = jnp.asarray([[0, 1, 2, 3], [4, 5, 6, 7]], jnp.int32)

    params_b = jax.tree.map(jnp.array, params)
    state_a = create_train_state(params, cfg.optim, cfg.detector)
    state_a, _ = make_multi_train_step(cfg, tx)(state_a, cache, idxs, rng)

    state_b = create_train_state(params_b, cfg.optim, cfg.detector)
    step = make_train_step(cfg, tx)
    for k in range(2):
        batch = {key: cache[key][idxs[k]] for key in cache}
        state_b, _ = step(state_b, batch, rng)

    assert state_a.ema is not None
    for la, lb in zip(
        jax.tree.leaves(state_a.ema), jax.tree.leaves(state_b.ema)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=2e-5, atol=2e-6
        )


def test_epoch_index_groups_match_dataloader_order():
    """The dispatch schedule consumes exactly the DataLoader's batch
    sequence (same seed/epoch, drop_last), so --device_cache training
    sees the same data stream as the loader path."""
    from dinov2_od_tpu.data.loader import shuffled_order

    n, b, k = 37, 4, 3
    groups = epoch_index_groups(n, b, k, seed=5, epoch=2)
    flat = np.concatenate([g.reshape(-1) for g in groups])
    order = shuffled_order(n, 5, 2)
    np.testing.assert_array_equal(flat, order[: (n // b) * b])
    assert all(g.shape[1] == b for g in groups)
    assert groups[0].shape[0] == k
    # skip drops whole leading batches (mid-epoch resume).
    skipped = epoch_index_groups(n, b, k, seed=5, epoch=2, skip=2)
    np.testing.assert_array_equal(
        np.concatenate([g.reshape(-1) for g in skipped]),
        order[2 * b : (n // b) * b],
    )


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.synthetic import write_coco_dataset

    out = tmp_path_factory.mktemp("dc")
    images_dir, ann = write_coco_dataset(
        str(out), num_images=10, seed=2, image_size=56, fmt="jpg"
    )
    return CocoDetectionDataset(
        images_dir, ann, image_size=56, max_boxes=6, output_dtype="uint8"
    )


def test_evaluate_cached_matches_evaluate_dataset(synth_dataset):
    """Cached one-dispatch eval returns the same COCO result dicts as the
    streaming evaluate_dataset (including the padded final batch)."""
    from dinov2_od_tpu.train.device_cache import evaluate_cached
    from dinov2_od_tpu.train.loop import evaluate_dataset
    from dinov2_od_tpu.train.step import make_eval_topk_step

    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    batch_size = 4  # 10 images -> 2 full + 1 padded batch

    step = make_eval_topk_step(cfg)
    want = evaluate_dataset(
        step, params, synth_dataset, batch_size,
        synth_dataset.label_to_cat_id,
    )

    cache, ids, n = upload_eval_cache(synth_dataset, batch_size)
    eval_all = make_cached_eval(cfg)
    got = evaluate_cached(
        eval_all, params, cache, ids, n, synth_dataset.label_to_cat_id
    )
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-4, atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-5


def test_upload_train_cache_roundtrip(synth_dataset):
    cache = upload_train_cache(synth_dataset)
    assert cache["images"].shape == (10, 56, 56, 3)
    assert cache["images"].dtype == jnp.uint8
    ex = synth_dataset.get_example(3)
    np.testing.assert_array_equal(np.asarray(cache["images"][3]), ex["images"])
    np.testing.assert_array_equal(np.asarray(cache["boxes"][3]), ex["boxes"])


@pytest.mark.slow
def test_cli_device_cache_trains(synth_dataset, tmp_path):
    """--device_cache end-to-end: two epochs, validation, checkpoint."""
    from dinov2_od_tpu.train.cli import main

    out = tmp_path / "run_dc"
    rc = main([
        "--train_images", synth_dataset.images_dir,
        "--train_annotations", synth_dataset.coco_path,
        "--val_images", synth_dataset.images_dir,
        "--val_annotations", synth_dataset.coco_path,
        "--lightweight",
        "--image_size", "56",
        "--batch_size", "4",
        "--num_classes", "6",
        "--num_epochs", "2",
        "--val_frequency", "2",
        "--device_cache",
        "--steps_per_dispatch", "2",
        "--output_dir", str(out),
    ])
    assert rc == 0
    assert (out / "metrics_epoch_1.json").exists()


# ---------------------------------------------------------------------------
# Sharded cache layout (rows over the data axis)
# ---------------------------------------------------------------------------

def _mesh8():
    from dinov2_od_tpu.parallel import create_mesh

    return create_mesh(model_parallel_size=1)


def test_sharded_upload_capacity_and_gather(synth_dataset):
    """Rows shard over the 8-way data axis (per-device HBM = n_pad/8
    rows) and sharded_batch_gather returns exactly the requested rows."""
    from dinov2_od_tpu.train.device_cache import sharded_batch_gather

    mesh = _mesh8()
    cache = upload_train_cache(synth_dataset, mesh, shard=True)
    n_pad = cache["images"].shape[0]
    assert n_pad == 16  # 10 rows padded to the 8-way axis
    for arr in cache.values():
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {n_pad // 8}

    idx = jnp.asarray([9, 0, 3, 7, 2, 5, 1, 8], jnp.int32)
    got = jax.jit(
        lambda c, i: sharded_batch_gather(mesh, "data", c, i)
    )(cache, idx)
    full = upload_train_cache(synth_dataset)
    for k in full:
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(full[k][np.asarray(idx)])
        )


def test_sharded_multi_step_trajectory_matches_replicated():
    """Bit-compatible trajectory: the sharded-cache multi-step produces
    the same params/losses as the replicated-cache multi-step (the
    psum_scatter gather has exactly one contributor per row)."""
    from dinov2_od_tpu.parallel import batch_sharding, shard_params
    from jax.sharding import NamedSharding, PartitionSpec

    cfg = _tiny_cfg()
    mesh = _mesh8()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    tx = make_optimizer(cfg.optim, cfg.detector, params)
    host = _cache(cfg, n=16)
    rng = jax.random.key(7)
    idxs = jnp.asarray(
        np.random.default_rng(1).integers(0, 16, size=(3, 8)), jnp.int32
    )
    bs = batch_sharding(mesh)

    copy = lambda p: jax.tree.map(jnp.array, p)

    # Replicated layout.
    rep = {
        k: jax.device_put(v, NamedSharding(mesh, PartitionSpec()))
        for k, v in host.items()
    }
    state_a = create_train_state(
        shard_params(copy(params), mesh), cfg.optim, cfg.detector
    )
    multi_a = make_multi_train_step(cfg, tx, mesh=mesh, batch_sharding_=bs)
    state_a, ma = multi_a(state_a, rep, idxs, rng)

    # Sharded layout.
    sh = NamedSharding(mesh, PartitionSpec("data"))
    shd = {
        k: jax.make_array_from_callback(
            v.shape, sh, lambda i, v=np.asarray(v): v[i]
        )
        for k, v in host.items()
    }
    state_b = create_train_state(
        shard_params(copy(params), mesh), cfg.optim, cfg.detector
    )
    multi_b = make_multi_train_step(
        cfg, tx, mesh=mesh, batch_sharding_=bs, sharded_cache=True
    )
    state_b, mb = multi_b(state_b, shd, idxs, rng)

    np.testing.assert_allclose(
        np.asarray(ma["loss"]), np.asarray(mb["loss"]), rtol=1e-6
    )
    for la, lb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-7
        )


def test_sharded_eval_cache_matches_replicated(synth_dataset):
    """Sharded eval cache (batch dim over 'data') returns the same
    result dicts as the replicated cache."""
    from dinov2_od_tpu.parallel import batch_sharding
    from dinov2_od_tpu.train.device_cache import evaluate_cached

    cfg = _tiny_cfg()
    mesh = _mesh8()
    params = init_detector_params(jax.random.key(0), cfg.detector)
    bs = batch_sharding(mesh)
    eval_all = make_cached_eval(cfg, mesh=mesh, batch_sharding_=bs)

    c_rep, ids, n = upload_eval_cache(synth_dataset, 8, mesh)
    want = evaluate_cached(
        eval_all, params, c_rep, ids, n, synth_dataset.label_to_cat_id
    )
    c_sh, ids2, n2 = upload_eval_cache(synth_dataset, 8, mesh, shard=True)
    got = evaluate_cached(
        eval_all, params, c_sh, ids2, n2, synth_dataset.label_to_cat_id
    )
    assert len(got) == len(want) and n2 == n
    for a, b in zip(got, want):
        assert a["image_id"] == b["image_id"]
        assert a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], rtol=1e-4, atol=1e-4)
        assert abs(a["score"] - b["score"]) < 1e-5
