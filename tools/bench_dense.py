"""Dense-GT / aux-loss train-step benchmark (VERDICT r2 item 6).

Measures the full ViT-B/14 train step at COCO worst-case GT density
(93 valid GT per image, max_boxes=100 — the setup of BENCH.md "Matcher at
COCO GT density") with and without --aux_loss (deep supervision matches
and scores every intermediate decoder layer, so the matcher runs
num_layers x per step at this density).

Usage:  python tools/bench_dense.py [--aux_loss] [--batch_size 32]
        [--valid_gt 93] [--share_aux_match]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(batch_size: int, valid_gt: int, aux_loss: bool,
        share_aux_match: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.config import DataConfig, OptimConfig, TrainConfig, \
        detector_config_for_model_name
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.models.detector import cast_frozen_weights
    from dinov2_od_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )
    from dinov2_od_tpu.utils.benchmark import measure_steps_per_sec

    max_boxes = 100
    det = detector_config_for_model_name(
        "facebook/dinov2-base", hidden_dim=768, image_size=224
    )
    det = dataclasses.replace(
        det,
        backbone=dataclasses.replace(det.backbone, dtype="bfloat16",
                                     scan_unroll=0),
        decoder=dataclasses.replace(det.decoder, aux_loss=aux_loss),
    )
    cfg = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=batch_size, max_boxes=max_boxes),
        optim=OptimConfig(),
        share_aux_match=share_aux_match,
    )

    params = init_detector_params(jax.random.key(0), det)
    params = cast_frozen_weights(params, det)
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (batch_size, 224, 224, 3)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, (batch_size, max_boxes, 2)).astype(np.float32)
    cxy = rng.uniform(0.2, 0.8, (batch_size, max_boxes, 2)).astype(np.float32)
    boxes = np.concatenate([cxy, wh], axis=-1)
    labels = rng.integers(0, 91, (batch_size, max_boxes)).astype(np.int32)
    valid = np.zeros((batch_size, max_boxes), bool)
    valid[:, :valid_gt] = True
    batch = {
        "images": jnp.asarray(images), "boxes": jnp.asarray(boxes),
        "labels": jnp.asarray(labels), "valid": jnp.asarray(valid),
    }

    sec, _ = measure_steps_per_sec(step, state, batch, jax.random.key(1),
                                   iters=8)
    out = {
        "metric": (
            f"ViT-B/14 train step, dense GT (G={valid_gt}/"
            f"max_boxes={max_boxes}), batch {batch_size}, "
            f"aux_loss={aux_loss}"
            + (", shared aux match" if share_aux_match else "")
        ),
        "sec_per_step": round(sec, 5),
        "value": round(batch_size / sec, 1),
        "unit": "images/sec/chip",
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--valid_gt", type=int, default=93)
    p.add_argument("--aux_loss", action="store_true")
    p.add_argument("--share_aux_match", action="store_true")
    p.add_argument("--both", action="store_true",
                   help="run aux_loss off and on back to back")
    args = p.parse_args()
    if args.both:
        run(args.batch_size, args.valid_gt, False)
        run(args.batch_size, args.valid_gt, True)
        run(args.batch_size, args.valid_gt, True, share_aux_match=True)
    else:
        run(args.batch_size, args.valid_gt, args.aux_loss,
            args.share_aux_match)


if __name__ == "__main__":
    main()
