"""Device-side augmentation (data/augment.py).

The reference has no augmentation (train.py:584-587 is Resize+ToTensor),
so these tests pin OUR semantics: geometry against numpy oracles, box/image
consistency via mass-centroid tracking, and the static-off guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dinov2_od_tpu.config import AugmentConfig
from dinov2_od_tpu.data.augment import (
    _color_jitter,
    _resample_matrix,
    apply_scale_translate,
    augment_batch,
)


def _batch(rng, B=3, H=32, W=32, G=4):
    images = jnp.asarray(rng.random((B, H, W, 3), dtype=np.float32))
    cx = rng.uniform(0.2, 0.8, (B, G))
    cy = rng.uniform(0.2, 0.8, (B, G))
    w = rng.uniform(0.05, 0.2, (B, G))
    h = rng.uniform(0.05, 0.2, (B, G))
    boxes = jnp.asarray(np.stack([cx, cy, w, h], -1).astype(np.float32))
    valid = jnp.asarray(rng.random((B, G)) > 0.3)
    return images, boxes, valid


def test_disabled_is_identity(rng):
    images, boxes, valid = _batch(rng)
    cfg = AugmentConfig()
    assert not cfg.enabled
    out_i, out_b, out_v = augment_batch(
        jax.random.key(0), images, boxes, valid, cfg
    )
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(images))
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(valid))


def test_hflip_mirrors_images_and_boxes(rng):
    images, boxes, valid = _batch(rng)
    cfg = AugmentConfig(hflip_prob=1.0)
    out_i, out_b, out_v = augment_batch(
        jax.random.key(1), images, boxes, valid, cfg
    )
    np.testing.assert_allclose(
        np.asarray(out_i), np.asarray(images)[:, :, ::-1, :], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out_b)[..., 0], 1.0 - np.asarray(boxes)[..., 0], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(out_b)[..., 1:], np.asarray(boxes)[..., 1:]
    )
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(valid))


def test_hflip_twice_is_identity(rng):
    images, boxes, valid = _batch(rng)
    cfg = AugmentConfig(hflip_prob=1.0)
    i1, b1, v1 = augment_batch(jax.random.key(2), images, boxes, valid, cfg)
    i2, b2, v2 = augment_batch(jax.random.key(3), i1, b1, v1, cfg)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(images))
    np.testing.assert_allclose(np.asarray(b2), np.asarray(boxes), atol=1e-6)


def test_resample_matrix_identity():
    w = np.asarray(_resample_matrix(16, jnp.float32(1.0), jnp.float32(0.0)))
    np.testing.assert_allclose(w, np.eye(16), atol=1e-6)


def test_resample_matrix_pure_translate():
    # Integer pixel shift by +3: out[i] = in[i-3]; first 3 rows read
    # outside the input -> all-zero (black fill).
    w = np.asarray(_resample_matrix(16, jnp.float32(1.0), jnp.float32(3.0)))
    expect = np.zeros((16, 16))
    for i in range(3, 16):
        expect[i, i - 3] = 1.0
    np.testing.assert_allclose(w, expect, atol=1e-6)


def test_scale_translate_boxes_follow_image_mass(rng):
    # Draw a white rectangle on black at a known box; after a known
    # zoom+shift the white mass centroid must land on the transformed
    # box center, and the transformed box must match the affine oracle.
    H = W = 64
    box = np.array([0.5, 0.375, 0.25, 0.25], np.float32)  # cxcywh
    img = np.zeros((1, H, W, 3), np.float32)
    x0, x1 = int((box[0] - box[2] / 2) * W), int((box[0] + box[2] / 2) * W)
    y0, y1 = int((box[1] - box[3] / 2) * H), int((box[1] + box[3] / 2) * H)
    img[0, y0:y1, x0:x1, :] = 1.0
    s, tx, ty = 0.7, 6.0, 10.0  # zoom out + shift right/down
    out_i, out_b, out_v = apply_scale_translate(
        jnp.asarray(img),
        jnp.asarray(box)[None, None, :],
        jnp.ones((1, 1), bool),
        jnp.full((1,), s),
        jnp.full((1,), tx),
        jnp.full((1,), ty),
        1e-3,
    )
    out_i = np.asarray(out_i)
    # Affine oracle for the box: x' = s*x + tx/W (same for y with ty/H).
    exp_cx, exp_cy = s * box[0] + tx / W, s * box[1] + ty / H
    exp_w, exp_h = s * box[2], s * box[3]
    got = np.asarray(out_b)[0, 0]
    np.testing.assert_allclose(got, [exp_cx, exp_cy, exp_w, exp_h], atol=2e-3)
    assert bool(np.asarray(out_v)[0, 0])
    # Image mass centroid tracks the box center (bilinear spreads edges
    # by <=1px; the centroid is robust to that).
    mass = out_i[0, :, :, 0]
    ys, xs = np.mgrid[0:H, 0:W]
    cx_px = (mass * xs).sum() / mass.sum()
    cy_px = (mass * ys).sum() / mass.sum()
    np.testing.assert_allclose(
        [(cx_px + 0.5) / W, (cy_px + 0.5) / H], [exp_cx, exp_cy], atol=0.01
    )
    # Zoom-out shrinks total mass by ~s^2 (content scaled, black fill).
    np.testing.assert_allclose(
        mass.sum() / img[0, :, :, 0].sum(), s * s, rtol=0.05
    )


def test_scale_translate_drops_out_of_frame_boxes():
    # Zoom-in (s=2) with a crop window on the right half: a box on the
    # far left leaves the frame entirely and must be invalidated.
    H = W = 32
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    boxes = jnp.asarray(
        np.array([[[0.1, 0.5, 0.1, 0.1], [0.75, 0.5, 0.1, 0.1]]], np.float32)
    )
    valid = jnp.ones((1, 2), bool)
    # x' = 2x - 1, y' = 2y - 0.5: left box -> x' = -0.8, fully out of
    # frame; right box -> centered at (0.5, 0.5).
    _, out_b, out_v = apply_scale_translate(
        img,
        boxes,
        valid,
        jnp.full((1,), 2.0),
        jnp.full((1,), -float(W)),
        jnp.full((1,), -float(H) / 2),
        1e-3,
    )
    v = np.asarray(out_v)[0]
    assert not v[0] and v[1]
    got = np.asarray(out_b)[0, 1]
    np.testing.assert_allclose(got, [0.5, 0.5, 0.2, 0.2], atol=1e-5)


def test_color_jitter_range_and_determinism(rng):
    images = jnp.asarray(rng.random((4, 16, 16, 3), dtype=np.float32))
    a = _color_jitter(jax.random.key(5), 0.4, images)
    b = _color_jitter(jax.random.key(5), 0.4, images)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    arr = np.asarray(a)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert not np.allclose(arr, np.asarray(images))


def test_color_jitter_zero_strength_identity(rng):
    images = jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32))
    out = _color_jitter(jax.random.key(6), 0.0, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(images), atol=1e-6)


def test_augment_batch_jits_and_batches(rng):
    images, boxes, valid = _batch(rng, B=4)
    cfg = AugmentConfig(hflip_prob=0.5, color_jitter=0.3, scale_jitter=0.3)
    fn = jax.jit(lambda k, i, b, v: augment_batch(k, i, b, v, cfg))
    out_i, out_b, out_v = fn(jax.random.key(7), images, boxes, valid)
    assert out_i.shape == images.shape
    assert out_b.shape == boxes.shape and out_v.shape == valid.shape
    arr = np.asarray(out_i)
    assert np.isfinite(arr).all() and arr.min() >= 0.0 and arr.max() <= 1.0
    b = np.asarray(out_b)
    assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()
    # Per-image randomness: images in the batch get different treatments.
    deltas = [
        float(np.abs(arr[i] - np.asarray(images)[i]).mean()) for i in range(4)
    ]
    assert len({round(d, 6) for d in deltas}) > 1


def test_train_step_with_augmentation():
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

    det = DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=1,
            target_dim=32,
        ),
        decoder=DecoderConfig(
            hidden_dim=32, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=64, num_classes=NUM_SYNTHETIC_CLASSES,
            dropout=0.0,
        ),
    )
    cfg = TrainConfig(
        detector=det,
        optim=OptimConfig(learning_rate=3e-4),
        augment=AugmentConfig(
            hflip_prob=0.5, color_jitter=0.2, scale_jitter=0.2
        ),
    )
    params = init_detector_params(jax.random.key(0), det)
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)
    raw = make_batch(np.random.default_rng(0), 2, image_size=56, max_boxes=6)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    state, metrics = step(state, batch, jax.random.key(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    # Different step -> different augmentation draw -> different loss.
    _, metrics2 = step(state, batch, jax.random.key(1))
    assert float(metrics2["loss"]) != loss


def test_augmented_step_dp_sharded_matches_single_device():
    # Augmentation draws (hflip masks, zoom factors) come from the step
    # rng, not device layout — the DP-sharded augmented step must match
    # the single-device one exactly like the plain step does.
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
    from dinov2_od_tpu.parallel import batch_sharding, create_mesh, shard_params
    from dinov2_od_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    det = DetectorConfig(
        backbone=BackboneConfig(variant="small", image_size=56, patch_size=14,
                                lora_r=1, target_dim=32),
        decoder=DecoderConfig(hidden_dim=32, num_queries=8, num_layers=2,
                              num_heads=4, dim_feedforward=64,
                              num_classes=NUM_SYNTHETIC_CLASSES, dropout=0.0),
    )
    cfg = TrainConfig(
        detector=det,
        optim=OptimConfig(learning_rate=3e-4),
        augment=AugmentConfig(hflip_prob=0.5, color_jitter=0.2,
                              scale_jitter=0.2),
    )
    params = init_detector_params(jax.random.key(0), det)
    tx = make_optimizer(cfg.optim, det, params)
    step = make_train_step(cfg, tx)
    raw = make_batch(np.random.default_rng(3), 8, image_size=56, max_boxes=6)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    rng_key = jax.random.key(7)

    copy = lambda p: jax.tree_util.tree_map(
        lambda x: jnp.array(np.asarray(x)), p
    )
    state_a = create_train_state(copy(params), cfg.optim, det)
    state_a, ma = step(state_a, batch, rng_key)

    mesh = create_mesh(model_parallel_size=1)
    state_b = create_train_state(
        shard_params(copy(params), mesh), cfg.optim, det
    )
    bs = batch_sharding(mesh)
    batch_sh = {k: jax.device_put(v, bs) for k, v in batch.items()}
    state_b, mb = step(state_b, batch_sh, rng_key)

    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=2e-4)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=3e-5
        )
