"""Predictor serving API: checkpoint load, LoRA folding, batched detect."""

import numpy as np
import jax
import pytest

from dinov2_od_tpu.config import BackboneConfig, DecoderConfig, DetectorConfig, OptimConfig
from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.inference import Predictor
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.train import create_train_state
from dinov2_od_tpu.train.checkpoint import save_checkpoint


def _cfg():
    return DetectorConfig(
        backbone=BackboneConfig(variant="small", image_size=56, lora_r=1,
                                target_dim=32, depth_override=2),
        decoder=DecoderConfig(hidden_dim=32, num_queries=5, num_layers=1,
                              num_heads=4, dim_feedforward=64, num_classes=6),
    )


def test_predictor_from_checkpoint_and_detect(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg)
    state = create_train_state(params, OptimConfig(), cfg)
    ckpt = save_checkpoint(str(tmp_path), 0, state.params, state.opt_state, 1.0)

    images_dir, _ = write_coco_dataset(
        str(tmp_path / "d"), num_images=3, image_size=56, seed=4
    )
    import os

    paths = sorted(
        os.path.join(images_dir, f) for f in os.listdir(images_dir)
    )

    p = Predictor.from_checkpoint(
        ckpt, detector_cfg=cfg, batch_size=2,
        label_to_cat_id={i: 10 * (i + 1) for i in range(6)},
        class_names={10 * (i + 1): f"color_{i}" for i in range(6)},
    )
    out = p.detect(paths, score_threshold=0.0, max_detections=5)
    assert len(out) == 3
    # Untrained model still yields structured detections above threshold 0.
    for dets in out:
        for d in dets:
            assert set(d) >= {"bbox", "score", "category_id", "name"}
            assert len(d["bbox"]) == 4
            assert d["category_id"] in p.label_to_cat_id.values()


def test_predictor_accepts_arrays_and_respects_threshold():
    cfg = _cfg()
    params = init_detector_params(jax.random.key(1), cfg)
    p = Predictor(params, cfg, batch_size=2, fold_lora=True)
    imgs = [np.random.default_rng(i).uniform(size=(56, 56, 3)).astype(np.float32)
            for i in range(3)]
    low = p.detect(imgs, score_threshold=0.0)
    high = p.detect(imgs, score_threshold=0.99)
    assert sum(len(d) for d in low) >= sum(len(d) for d in high)


def test_predictor_int8_quantized_serving():
    """Predictor(quantize='int8') folds LoRA, quantizes the backbone,
    and serves detections close to the bf16 predictor's."""
    cfg = _cfg()
    params = init_detector_params(jax.random.key(2), cfg)
    p_f = Predictor(params, cfg, batch_size=2, fold_lora=True)
    p_q = Predictor(params, cfg, batch_size=2, fold_lora=True,
                    quantize="int8")
    assert str(p_q.params["backbone"]["blocks"]["q"]["kernel_q"].dtype) == "int8"
    imgs = [np.random.default_rng(7).uniform(size=(56, 56, 3)).astype(np.float32)]
    d_f = p_f.detect(imgs, score_threshold=0.0)
    d_q = p_q.detect(imgs, score_threshold=0.0)
    # Same number of query slots survive at threshold 0; scores close.
    assert len(d_f[0]) == len(d_q[0])
    s_f = sorted(d["score"] for d in d_f[0])
    s_q = sorted(d["score"] for d in d_q[0])
    np.testing.assert_allclose(s_f, s_q, atol=0.05)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="quantize"):
        Predictor(params, cfg, quantize="int4")
