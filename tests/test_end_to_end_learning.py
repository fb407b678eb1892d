"""End-to-end learning test: overfit a tiny detector on 8 synthetic images
through the REAL pipeline (COCO files -> dataset -> loader -> train steps
-> device postprocess -> COCOeval) and require AP to become nontrivial.
This is the port of the reference's `--debug` overfit verification
(train.py:50-84, README.md:171-181) with an actual metric gate."""

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
from dinov2_od_tpu.data.coco import CocoDetectionDataset
from dinov2_od_tpu.data.loader import DataLoader
from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.evaluation.coco_metrics import compute_coco_metrics
from dinov2_od_tpu.evaluation.postprocess import postprocess_detections
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.train import create_train_state, make_optimizer, make_train_step
from dinov2_od_tpu.train.step import make_eval_step


def test_overfit_reaches_nontrivial_ap(tmp_path):
    images_dir, ann_file = write_coco_dataset(
        str(tmp_path), num_images=8, image_size=56, seed=7, max_objects=2
    )
    ds = CocoDetectionDataset(images_dir, ann_file, image_size=56, max_boxes=6)

    det = DetectorConfig(
        backbone=BackboneConfig(
            variant="small", image_size=56, patch_size=14, lora_r=2,
            target_dim=48, hidden_dim_override=96, depth_override=3,
            num_heads_override=4, mlp_ratio_override=2.0,
        ),
        decoder=DecoderConfig(
            hidden_dim=48, num_queries=8, num_layers=2, num_heads=4,
            dim_feedforward=96, num_classes=ds.num_classes,
            use_deformable=True, dropout=0.0,
        ),
    )
    cfg = TrainConfig(detector=det, optim=OptimConfig(learning_rate=2e-3))

    params = init_detector_params(jax.random.key(0), det)
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)

    # One fixed batch of all 8 images (loader exercised, deterministic).
    loader = DataLoader(ds, batch_size=8, shuffle=False)
    batch_np = next(iter(loader))
    batch = {
        k: jnp.asarray(v)
        for k, v in batch_np.items()
        if k in ("images", "boxes", "labels", "valid")
    }

    @jax.jit
    def run_n(state, n):
        def body(i, st):
            st, _ = step(st, batch, jax.random.key(3))
            return st
        return jax.lax.fori_loop(0, n, body, state)

    # step() donates its input state — thread the returned state through.
    state, first_metrics = step(state, batch, jax.random.key(3))
    first_loss = float(first_metrics["loss"])
    state = run_n(state, 399)
    state, last_metrics = step(state, batch, jax.random.key(3))
    last_loss = float(last_metrics["loss"])
    assert last_loss < 0.3 * first_loss, (first_loss, last_loss)

    # Evaluate with the real postprocess + COCOeval on the train images.
    eval_step = make_eval_step(cfg)
    out = eval_step(state.params, batch["images"])
    results = postprocess_detections(
        np.asarray(out["pred_logits"]),
        np.asarray(out["pred_boxes"]),
        batch_np["image_id"],
        batch_np["orig_size"],
        ds.label_to_cat_id,
    )
    assert results, "no detections above threshold after overfitting"
    metrics = compute_coco_metrics(results, ann_file)
    # Overfit on 8 images with 1-2 big colored rectangles each: the model
    # must localize them at IoU 0.5 decently.
    assert metrics["AP50"] > 0.3, metrics
