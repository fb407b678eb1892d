"""Auxiliary decoding losses (deep supervision), DecoderConfig.aux_loss.

A capability the reference lacks (detr_decoder.py supervises only the
final layer); Deformable-DETR sec. 4 shows it is worth several COCO AP.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from dinov2_od_tpu.config import (
    DataConfig,
    MatcherConfig,
    OptimConfig,
    TrainConfig,
    lightweight_detector_config,
)
from dinov2_od_tpu.data.synthetic import make_batch
from dinov2_od_tpu.models import detector_apply, init_detector_params
from dinov2_od_tpu.train import create_train_state, make_optimizer, make_train_step


def _cfg(aux):
    det = lightweight_detector_config(image_size=56)
    return dataclasses.replace(
        det, decoder=dataclasses.replace(det.decoder, aux_loss=aux)
    )


def test_aux_outputs_shapes_and_default_off():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)).astype(np.float32))

    det_off = _cfg(False)
    params = init_detector_params(jax.random.key(0), det_off)
    out_off = detector_apply(params, det_off, images)
    assert "aux_outputs" not in out_off

    det_on = _cfg(True)
    # Eval mode never collects intermediates (nothing reads them).
    assert "aux_outputs" not in detector_apply(params, det_on, images)
    out_on = detector_apply(
        params, det_on, images, deterministic=False, rng=jax.random.key(1)
    )
    L = det_on.decoder.num_layers
    assert len(out_on["aux_outputs"]) == L - 1
    for aux in out_on["aux_outputs"]:
        assert aux["pred_logits"].shape == out_on["pred_logits"].shape
        assert aux["pred_boxes"].shape == out_on["pred_boxes"].shape
    # Final outputs are identical with/without collection (same final
    # layer, same heads, same dropout rng).
    out_off_train = detector_apply(
        params, det_off, images, deterministic=False, rng=jax.random.key(1)
    )
    np.testing.assert_allclose(
        np.asarray(out_on["pred_logits"]),
        np.asarray(out_off_train["pred_logits"]),
        rtol=1e-6, atol=1e-6,
    )


def test_share_aux_match_trains_and_reuses_assignment():
    """TrainConfig.share_aux_match: aux layers reuse the final match —
    the step still trains (finite loss/grads) and set_criterion's
    match-reuse API returns identical losses when handed its own match."""
    from dinov2_od_tpu.config import LossConfig
    from dinov2_od_tpu.ops.losses import set_criterion

    det = _cfg(True)
    tc = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=2, image_size=56, max_boxes=8),
        optim=OptimConfig(),
        matcher=MatcherConfig(),
        share_aux_match=True,
    )
    params = init_detector_params(jax.random.key(0), det)
    tx = make_optimizer(tc.optim, det, params)
    state = create_train_state(params, tc.optim, det)
    step = make_train_step(tc, tx)
    raw = make_batch(np.random.default_rng(1), 2, image_size=56, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert any(k.startswith("loss_aux_") for k in metrics)

    # API invariant: criterion(match=own_match) == criterion().
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 6, 5)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0.2, 0.6, (2, 6, 4)).astype(np.float32))
    gtl = jnp.asarray(rng.integers(0, 5, (2, 4)).astype(np.int32))
    gtb = jnp.asarray(rng.uniform(0.2, 0.6, (2, 4, 4)).astype(np.float32))
    gtv = jnp.asarray(np.array([[1, 1, 1, 0], [1, 0, 0, 0]], bool))
    base, match = set_criterion(
        logits, boxes, gtl, gtb, gtv, MatcherConfig(), LossConfig(),
        num_classes=5, return_match=True,
    )
    reused = set_criterion(
        logits, boxes, gtl, gtb, gtv, MatcherConfig(), LossConfig(),
        num_classes=5, match=match,
    )
    for k in base:
        np.testing.assert_allclose(
            np.asarray(base[k]), np.asarray(reused[k]), rtol=1e-6
        )


def test_aux_loss_trains_and_adds_terms():
    det = _cfg(True)
    tc = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=2, image_size=56, max_boxes=8),
        optim=OptimConfig(),
        matcher=MatcherConfig(),
    )
    params = init_detector_params(jax.random.key(0), det)
    tx = make_optimizer(tc.optim, det, params)
    state = create_train_state(params, tc.optim, det)
    step = make_train_step(tc, tx)

    raw = make_batch(np.random.default_rng(1), 2, image_size=56, max_boxes=8)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    # Snapshot before stepping: the jitted step donates its input state.
    fc1_before = np.asarray(params["decoder"]["layers"]["fc1"]["kernel"])
    state, metrics = step(state, batch, jax.random.key(2))

    L = det.decoder.num_layers
    aux_keys = [k for k in metrics if k.startswith("loss_aux_")]
    assert len(aux_keys) == L - 1
    total = float(metrics["loss"])
    aux_sum = sum(float(metrics[k]) for k in aux_keys)
    assert np.isfinite(total) and aux_sum > 0.0
    assert total > aux_sum  # main term also present
    assert np.isfinite(float(metrics["grad_norm"]))
    # Deep supervision must reach the early decoder layers: their FFN
    # weights (per-layer stacked leading axis) receive nonzero updates.
    fc1_after = np.asarray(state.params["decoder"]["layers"]["fc1"]["kernel"])
    per_layer_change = np.abs(fc1_after - fc1_before).reshape(L, -1).max(axis=1)
    assert (per_layer_change > 0).all(), per_layer_change
