"""Headline benchmark: ViT-B/14 + DETR training throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

- Runs the full jitted train step (forward + on-device Hungarian matching
  + set loss + backward + clip + Adam) on the flagship config
  (facebook/dinov2-base equivalent: ViT-B/14 backbone with LoRA, 3-layer
  deformable DETR decoder, 91 classes, 224px), bf16 backbone compute.
- Timing uses the async-safe chained-step methodology in
  utils/benchmark.py (this host's remote TPU dispatch returns before
  execution finishes, so naive block_until_ready timing is meaningless).
- vs_baseline compares against the PyTorch reference executing its own
  train step on this host (BASELINE_MEASURED.json, produced by
  tools/measure_baseline.py — the reference supports only CUDA/CPU, so
  CPU is its hardware here; the reference publishes no numbers of its
  own, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.config import (
        DataConfig,
        OptimConfig,
        TrainConfig,
        detector_config_for_model_name,
    )
    import dataclasses

    from dinov2_od_tpu.data.synthetic import make_batch
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )
    from dinov2_od_tpu.utils.benchmark import measure_steps_per_sec

    # Env-configurable: BENCH_BATCH, BENCH_MODEL (small|base|large),
    # BENCH_IMAGE_SIZE (224|518), BENCH_MODE (train|eval), BENCH_REMAT=1,
    # BENCH_FFN=moe (MoE backbone FFN, ops/moe.py; BENCH_MOE_EXPERTS).
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    model = os.environ.get("BENCH_MODEL", "base")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "224"))
    mode = os.environ.get("BENCH_MODE", "train")
    ffn = os.environ.get("BENCH_FFN", "")
    n_chips = max(1, len(jax.devices()))

    det = detector_config_for_model_name(
        f"facebook/dinov2-{model}", hidden_dim=768, image_size=image_size
    )
    det = dataclasses.replace(
        det,
        backbone=dataclasses.replace(
            det.backbone,
            dtype="bfloat16",
            # Full depth unroll: the scan backward's dynamic-update-slice
            # gradient stacking costs ~15ms/step at ViT-B batch 32
            # (trace-verified); unrolled = 507 vs 407 img/s. EXCEPT
            # giant: 40 unrolled 1536-wide blocks make an HLO module the
            # relay's remote-compile service cannot digest — the scanned
            # backbone keeps compile size O(1 block).
            scan_unroll=int(
                os.environ.get(
                    "BENCH_SCAN_UNROLL", "1" if model == "giant" else "0"
                )
            ),
            # BENCH_PREFIX_INT8=1: int8 forward for the frozen prefix
            # blocks (stop-gradiented -> pure inference; BENCH.md).
            prefix_int8=os.environ.get("BENCH_PREFIX_INT8", "0") == "1",
            ffn_type_override=ffn or None,
            moe_num_experts=int(os.environ.get("BENCH_MOE_EXPERTS", "8")),
        ),
    )
    # BENCH_AUG=1: device-side train-time augmentation (data/augment.py)
    # at representative strengths, to price its step overhead.
    aug_kwargs = {}
    if os.environ.get("BENCH_AUG", "0") == "1":
        from dinov2_od_tpu.config import AugmentConfig

        aug_kwargs["augment"] = AugmentConfig(
            hflip_prob=0.5, color_jitter=0.3, scale_jitter=0.25
        )
    cfg = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=batch_size, max_boxes=25),
        optim=OptimConfig(),
        use_remat=os.environ.get("BENCH_REMAT", "0") == "1",
        **aug_kwargs,
    )

    from dinov2_od_tpu.models.detector import cast_frozen_weights

    params = init_detector_params(jax.random.key(0), det)
    # Numerically identical (forward casts to bf16 anyway); kills per-step
    # weight conversions + halves frozen-weight HBM reads.
    params = cast_frozen_weights(params, det)
    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)

    raw = make_batch(
        np.random.default_rng(0), batch_size, image_size=image_size,
        max_boxes=25,
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    if mode == "eval":
        from dinov2_od_tpu.models import detector_apply
        from dinov2_od_tpu.models.detector import fold_detector_lora
        from dinov2_od_tpu.utils.benchmark import time_fn

        eval_params = fold_detector_lora(params, det)
        if os.environ.get("BENCH_QUANT") == "int8":
            # W8A8 serving path (models/quantize.py): backbone GEMMs on
            # the MXU int8 rate. Measured +25% (ViT-B/224 b32) and +28%
            # (ViT-L/518 b8) over bf16 eval on v5e.
            from dinov2_od_tpu.models.quantize import quantize_detector_int8

            eval_params = quantize_detector_int8(eval_params, det)
        # params passed as an argument — closing over them would embed all
        # 86M weights as HLO constants (this backend's remote-compile
        # service rejects oversized modules with HTTP 413).
        sec_per_step = time_fn(
            lambda im, p: detector_apply(p, det, im, deterministic=True),
            batch["images"], eval_params,
        )
    else:
        sec_per_step, _ = measure_steps_per_sec(
            step, state, batch, jax.random.key(1), iters=8
        )
    images_per_sec_chip = batch_size / sec_per_step / n_chips

    vs_baseline = 0.0
    baseline_file = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        ref = base.get("standard_attention", {}).get("images_per_sec", 0.0)
        if ref > 0:
            vs_baseline = images_per_sec_chip / ref

    print(
        json.dumps(
            {
                "metric": (
                    f"ViT-{model[0].upper()}/14+DETR(deformable) {mode} "
                    f"step throughput (batch {batch_size}, {image_size}px, "
                    + (
                        "int8 W8A8 backbone, "
                        if mode == "eval"
                        and os.environ.get("BENCH_QUANT") == "int8"
                        else "bf16 backbone, "
                    )
                    + (f"moe-E{det.backbone.moe_num_experts} FFN, " if ffn == "moe" else "")
                    + f"{jax.default_backend()})"
                ),
                "value": round(images_per_sec_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
