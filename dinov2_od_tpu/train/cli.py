"""Training CLI — the `python -m dinov2_od_tpu.train` entry point.

Mirrors the reference's `python -m dino_detector.train` flag surface
(dino_detector/train.py:1354-1462: dataset paths, download toggles,
debug/overfit mode, coco-mini subsets, test-mini, lightweight config,
checkpointing, loss/matcher costs, logging) on top of the JAX SPMD
runtime:

- no process spawning: `--distributed`/`--world_size` are accepted for
  compatibility but parallelism is a device mesh (all local devices by
  default; `--model_parallel` adds tensor parallelism);
- `--device` is accepted and ignored (JAX selects the backend);
- new flags: --model_parallel, --parity_mode, --pretrained_backbone,
  --image_size, --no_normalize, --fsdp (ZeRO-3 param/optimizer
  sharding over the data axis).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

from .. import config as C


def str2bool(v) -> bool:
    """Proper boolean flag parsing. The reference used `type=bool`, which
    treats any non-empty string (including "False") as True
    (train.py:1421; SURVEY.md §5 quirk)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "t", "yes", "y")


def build_arg_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train DINOv2 Object Detector (TPU)")

    # Dataset paths (reference train.py:1357-1366)
    p.add_argument("--train_images", type=str, default="")
    p.add_argument("--train_annotations", type=str, default="")
    p.add_argument("--val_images", type=str, default="")
    p.add_argument("--val_annotations", type=str, default="")
    p.add_argument("--testdev_images", type=str, default="")

    # Dataset download (reference train.py:1369-1376)
    p.add_argument("--data_dir", type=str, default="coco_data")
    p.add_argument("--download_train_data", action="store_true")
    p.add_argument("--download_val_data", action="store_true")
    p.add_argument("--download_test_data", action="store_true")

    # Training options (reference train.py:1379-1386)
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--checkpoint", type=str, default="")
    p.add_argument("--val_frequency", type=int, default=5)
    p.add_argument("--only_evaluate", action="store_true")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="serving-path quantization for --only_evaluate: "
                        "'int8' folds LoRA and runs the backbone GEMMs "
                        "as W8A8 on the MXU's int8 rate (+25-28%% eval "
                        "throughput on v5e; single-chip/DP only)")
    p.add_argument("--num_epochs", type=int, default=None)
    p.add_argument("--learning_rate", type=float, default=None)

    # Parallelism (reference had --distributed/--world_size/--dist_url;
    # JAX SPMD needs no process spawning)
    p.add_argument("--distributed", action="store_true",
                   help="accepted for compatibility; mesh parallelism is automatic")
    p.add_argument("--world_size", type=int, default=0,
                   help="accepted for compatibility; ignored")
    p.add_argument("--dist_url", type=str, default="env://",
                   help="accepted for compatibility; ignored")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host SPMD job via "
                        "jax.distributed.initialize; on TPU pods the "
                        "coordinator/process count are discovered from "
                        "the environment (no args needed); each host "
                        "loads its slice of every global batch")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multihost; optional on "
                        "TPU pods)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count (multihost; optional on "
                        "TPU pods)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's id (multihost; optional on TPU "
                        "pods)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="model-axis size of the mesh: tensor parallelism "
                        "by default; repurposed as the sequence axis "
                        "under --context_parallel or the stage axis under "
                        "--pipeline_parallel")
    p.add_argument("--context_parallel", action="store_true",
                   help="context (sequence) parallelism: backbone "
                        "attention runs as ring attention with tokens "
                        "sharded over the model axis (requires "
                        "--model_parallel > 1; exclusive with TP/PP)")
    p.add_argument("--context_parallel_size", type=int, default=0,
                   help="dedicated context-axis size (three-axis mesh "
                        "data x context x model): ring attention over "
                        "the context axis COMPOSED with tensor "
                        "parallelism of --model_parallel over the model "
                        "axis (exclusive with --context_parallel/"
                        "--pipeline_parallel)")
    p.add_argument("--pipeline_parallel_size", type=int, default=0,
                   help="dedicated stage-axis size (three-axis mesh "
                        "data x stage x model): backbone pipeline over "
                        "the stage axis COMPOSED with tensor parallelism "
                        "of --model_parallel over the model axis "
                        "(exclusive with --pipeline_parallel/"
                        "--context_parallel*)")
    p.add_argument("--pipeline_parallel", action="store_true",
                   help="pipeline parallelism: backbone depth splits into "
                        "--model_parallel GPipe stages (exclusive with "
                        "TP/CP)")
    p.add_argument("--pipeline_microbatches", type=int, default=0,
                   help="microbatches for the pipeline schedule "
                        "(0 -> stage count)")
    p.add_argument("--pipeline_chunks", type=int, default=1,
                   help="chunks per pipeline stage: 1 = GPipe; >1 = "
                        "interleaved schedule (each device holds that "
                        "many non-consecutive depth chunks; bubble "
                        "shrinks by the same factor; microbatches must "
                        "divide by the stage count)")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3: shard parameters + optimizer state over "
                        "the data axis (weights all-gathered on use, "
                        "gradients reduce-scattered — ~1/N param memory "
                        "per device at unchanged math). Composes with "
                        "--model_parallel; exclusive with pipeline/"
                        "context parallelism")

    # Debug / overfit (reference train.py:1397-1406)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--debug_samples", type=int, default=32)
    p.add_argument("--batch_size", type=int, default=8,
                   help="per-chip batch. 32 is the measured throughput "
                        "sweet spot on v5e (larger per-chip batches "
                        "degrade the bandwidth-bound attention path — "
                        "BENCH.md 'Batch-64'); for bigger effective "
                        "batches prefer --gradient_accumulation_steps "
                        "or more chips (DP)")
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine", "linear"],
                   help="LR schedule (beyond reference, which has none): "
                        "cosine/linear decay to --min_lr_ratio x lr over "
                        "the run, with optional --warmup_steps")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear LR warmup from 0 over this many optimizer "
                        "steps (works with every --lr_schedule)")
    p.add_argument("--min_lr_ratio", type=float, default=0.0,
                   help="decay floor as a fraction of the peak lr")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of trainable weights (0 = off; e.g. 0.999): "
                        "validation and the final model use the EMA-"
                        "merged weights")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip optimizer steps whose gradients contain "
                        "NaN/Inf (params and Adam moments untouched; "
                        "skips counted in the logged metrics)")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1,
                   help="accumulate gradients over N steps before each "
                        "optimizer update (optax MultiSteps): effective "
                        "batch = batch_size * N * data-parallel chips. "
                        "The recommended way to scale the effective "
                        "batch past the per-chip sweet spot")
    p.add_argument("--debug_lr", type=float, default=5e-4)

    # Train-time augmentation (beyond reference — its pipeline is
    # Resize+ToTensor only, train.py:584-587). Runs on device inside the
    # jitted train step (data/augment.py); defaults off (parity).
    p.add_argument("--hflip_prob", type=float, default=0.0,
                   help="per-image horizontal-flip probability (boxes "
                        "mirrored with the image); 0 = off")
    p.add_argument("--color_jitter", type=float, default=0.0,
                   help="brightness/contrast/saturation jitter strength "
                        "s: per-image factors ~ U[1-s, 1+s]; 0 = off")
    p.add_argument("--scale_jitter", type=float, default=0.0,
                   help="random zoom strength s: aspect-preserving scale "
                        "~ U[1-s, 1+s] with random placement (zoom-out "
                        "pads, zoom-in crops); boxes follow, clipped "
                        "boxes below --min_box_size are dropped; 0 = off")
    p.add_argument("--min_box_size", type=float, default=1e-3,
                   help="normalized min box side kept after scale jitter")
    p.add_argument("--save_on_preemption", type=str2bool, default=True,
                   help="on SIGTERM (pod preemption / cluster eviction): "
                        "checkpoint at the next step boundary and exit "
                        "cleanly; resume with --checkpoint restarts the "
                        "interrupted epoch")
    p.add_argument("--compilation_cache", type=str, default="",
                   help="directory for JAX's persistent compilation "
                        "cache: re-runs, post-training evaluation, and "
                        "serving restarts deserialize compiled programs "
                        "instead of recompiling (a cold ViT-B step is "
                        "~20-40s of XLA compile on remote-attached TPUs)")

    # coco-mini (reference train.py:1408-1419)
    p.add_argument("--use_coco_mini", action="store_true")
    p.add_argument("--coco_mini_size", type=str, default="1k")
    p.add_argument("--coco_mini_seed", type=int, default=42)
    p.add_argument("--coco_mini_indices_file", type=str, default="")
    p.add_argument("--test_mini", action="store_true")
    p.add_argument("--test_mini_size", type=int, default=30)

    # Model architecture (reference train.py:1421-1431)
    p.add_argument("--use_deformable", type=str2bool, default=True)
    p.add_argument("--backbone_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="backbone activation compute dtype; bfloat16 is "
                        "~2x faster on TPU (frozen weights are then also "
                        "stored bf16 — numerically identical since the "
                        "forward casts anyway). float32 default matches "
                        "the reference")
    p.add_argument("--backbone_prefix_int8", type=str2bool, default=False,
                   help="int8 (W8A8) forward for the frozen prefix "
                        "blocks during training: they are stop-"
                        "gradiented, so their forward is pure inference "
                        "and the serving quantization applies (adapted "
                        "suffix stays full precision)")
    p.add_argument("--aux_loss", type=str2bool, default=False,
                   help="deep supervision: match+score every intermediate "
                        "decoder layer (Deformable-DETR sec. 4); not in "
                        "the reference")
    p.add_argument("--share_aux_match", type=str2bool, default=False,
                   help="aux losses reuse the final decoder layer's "
                        "assignment instead of re-matching per layer "
                        "(cheaper at dense GT; DETR semantics is "
                        "per-layer matching)")
    p.add_argument("--n_points", type=int, default=2)
    p.add_argument("--dino_model", type=str, default="facebook/dinov2-base")
    # MoE backbone FFN (beyond reference; ops/moe.py). Experts shard
    # over the model axis (expert parallelism) under --model_parallel.
    p.add_argument("--ffn_type", type=str, default=None,
                   choices=["mlp", "swiglu", "moe"],
                   help="override the backbone FFN type (default: the "
                        "ViT variant's — mlp, swiglu for giant); 'moe' "
                        "swaps in a mixture-of-experts FFN with "
                        "expert-parallel sharding")
    p.add_argument("--moe_experts", type=int,
                   default=C.BackboneConfig.moe_num_experts,
                   help="experts per MoE layer (with --ffn_type moe)")
    p.add_argument("--moe_top_k", type=int,
                   default=C.BackboneConfig.moe_top_k,
                   help="experts routed per token")
    p.add_argument("--moe_capacity_factor", type=float,
                   default=C.BackboneConfig.moe_capacity_factor,
                   help="per-expert slot budget multiplier")
    p.add_argument("--moe_aux_weight", type=float,
                   default=C.BackboneConfig.moe_aux_weight,
                   help="router load-balance loss weight")
    p.add_argument("--lightweight", action="store_true")
    p.add_argument("--skip_checkpoint_load", action="store_true")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--pretrained_backbone", type=str, default="",
                   help="path to an HF PyTorch DINOv2 checkpoint dir/file to import")
    p.add_argument("--import_reference_checkpoint", type=str, default="",
                   help="path to a full PyTorch reference (dino_detector) "
                        "detector checkpoint to migrate (backbone + LoRA + "
                        "decoder)")

    # Loss / matcher (reference train.py:1434-1445)
    p.add_argument("--set_cost_class", type=float, default=1.0)
    p.add_argument("--set_cost_bbox", type=float, default=5.0)
    p.add_argument("--set_cost_giou", type=float, default=2.0)
    p.add_argument("--focal_alpha", type=float, default=0.25)
    p.add_argument("--focal_gamma", type=float, default=2.0)
    p.add_argument("--device", type=str, default="tpu",
                   help="accepted for compatibility; JAX selects the backend")
    p.add_argument("--num_classes", type=int, default=91)
    p.add_argument("--memory_monitor", action="store_true")
    p.add_argument("--num_workers", type=int, default=C.DataConfig.num_workers,
                   help="data-loading worker count (reference "
                        "config.py:8): decode/resize threads for the "
                        "threaded loader")
    p.add_argument("--checkpoint_frequency", type=int,
                   default=C.TrainConfig.checkpoint_every_epochs,
                   help="save a checkpoint every N epochs (reference "
                        "hardcodes 10, train.py:1279)")
    p.add_argument("--loader", type=str, default="threaded",
                   choices=["threaded"],
                   help="input pipeline backend (the zero-dependency "
                        "threaded prefetch loader; a Grain backend was "
                        "measured 45-348 img/s vs 424 threaded and "
                        "removed — BENCH.md input-pipeline ledger)")

    p.add_argument("--feed_dtype", type=str, default=C.DataConfig.feed_dtype,
                   choices=["uint8", "float32"],
                   help="image feed dtype: uint8 ships raw bytes and "
                        "normalizes in-jit (4x less H2D traffic); "
                        "float32 preprocesses on the host (reference "
                        "behavior)")
    p.add_argument("--decode_backend", type=str,
                   default=C.DataConfig.decode_backend,
                   choices=["auto", "cv2", "pil"],
                   help="JPEG decode: auto = native C thread-pool decoder "
                        "(libjpeg-turbo M/8 scaled decode, falls back to "
                        "cv2/PIL); cv2 = reduced-scale cv2 path; pil = "
                        "exact reference pixels (forced by --parity_mode)")
    p.add_argument("--device_cache", action="store_true",
                   help="upload the whole train/val dataset to device HBM "
                        "once and gather batches on-device: zero per-step "
                        "H2D beyond a tiny index array (dataset must fit "
                        "in HBM — 10k 224px uint8 images = 1.5 GB "
                        "replicated, /data-axis-size when sharded)")
    p.add_argument("--device_cache_layout", type=str, default="auto",
                   choices=["auto", "replicated", "sharded"],
                   help="cache placement: 'sharded' splits rows over the "
                        "data axis (capacity x axis size; batches routed "
                        "by an exact psum_scatter gather), 'replicated' "
                        "keeps a full copy per device; 'auto' shards "
                        "whenever the data axis is >1 or the run is "
                        "multi-host")
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="with --device_cache: train steps per host "
                        "dispatch (lax.scan); amortizes the dispatch "
                        "round trip on high-latency links")
    p.add_argument("--packed_train_data", type=str, default=None,
                   help="directory from tools/pack_dataset.py: train from "
                        "pre-decoded uint8 memmaps (no JPEG decode in the "
                        "loop); overrides --train_images/--train_annotations")
    p.add_argument("--packed_val_data", type=str, default=None,
                   help="packed directory for the validation split")

    # Parity / quirk toggles
    p.add_argument("--parity_mode", action="store_true",
                   help="reproduce reference eval quirks (no box rescale, "
                        "contiguous category ids, class 0 skipped)")
    p.add_argument("--no_normalize", action="store_true",
                   help="skip ImageNet normalization (reference behavior)")
    p.add_argument("--ref_match_bug", action="store_true",
                   help="replicate the reference's batch-0 matching bug "
                        "(every image matched with image 0's predictions; "
                        "matching.py:102) for A/B accuracy studies")
    p.add_argument("--keep_cls_token", action="store_true",
                   help="keep the CLS token in the decoder memory, making "
                        "the deformable grid 65/257 tokens with non-square "
                        "factoring (reference behavior; the default drops "
                        "it — SURVEY.md §7.5 fix)")
    p.add_argument("--tie_decoder_layers", action="store_true",
                   help="tie all decoder layers to one weight instance "
                        "(reproduces the reference's accidental tying, "
                        "deformable_attention.py:284)")

    # Logging (reference train.py:1448-1461)
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--log_frequency", type=int, default=10)
    p.add_argument("--experiment_name", type=str, default=None)
    p.add_argument("--log_images", action="store_true")
    p.add_argument("--log_images_frequency", type=int, default=100)
    return p


def build_detector_config(args) -> C.DetectorConfig:
    if args.lightweight:
        cfg = C.lightweight_detector_config(
            num_classes=args.num_classes,
            use_deformable=args.use_deformable,
            n_points=args.n_points,
            image_size=args.image_size,
        )
    else:
        cfg = C.detector_config_for_model_name(
            args.dino_model,
            num_classes=args.num_classes,
            use_deformable=args.use_deformable,
            n_points=args.n_points,
            image_size=args.image_size,
        )
    import dataclasses

    if args.parity_mode:
        # Exact erf GELU (torch nn.GELU) for AP-parity runs; the default
        # tanh approximation deviates by <=5e-4 per activation.
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, gelu_approximate=False),
        )
    if args.keep_cls_token:
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, drop_cls_token=False),
        )
    if args.tie_decoder_layers:
        cfg = dataclasses.replace(
            cfg,
            decoder=dataclasses.replace(cfg.decoder, tie_layer_weights=True),
        )
    if args.aux_loss:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, aux_loss=True)
        )
    if args.backbone_dtype != cfg.backbone.dtype:
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, dtype=args.backbone_dtype),
        )
    if args.backbone_prefix_int8:
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(cfg.backbone, prefix_int8=True),
        )
    if getattr(args, "ffn_type", None):
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(
                cfg.backbone,
                ffn_type_override=args.ffn_type,
                moe_num_experts=args.moe_experts,
                moe_top_k=args.moe_top_k,
                moe_capacity_factor=args.moe_capacity_factor,
                moe_aux_weight=args.moe_aux_weight,
            ),
        )
    return cfg


def main(argv: Optional[List[str]] = None) -> int:
    parser = build_arg_parser()
    args = parser.parse_args(argv)
    if args.context_parallel and args.pipeline_parallel:
        parser.error(
            "--context_parallel and --pipeline_parallel both claim the "
            "model axis; enable at most one"
        )
    if args.context_parallel_size > 0 and args.context_parallel:
        parser.error(
            "--context_parallel_size (dedicated context axis) and "
            "--context_parallel (legacy: ring over the model axis) are "
            "exclusive; use one"
        )
    if args.context_parallel_size > 0 and args.pipeline_parallel:
        parser.error(
            "--context_parallel_size cannot be combined with "
            "--pipeline_parallel"
        )
    if args.pipeline_parallel_size > 0 and (
        args.pipeline_parallel
        or args.context_parallel
        or args.context_parallel_size > 0
    ):
        parser.error(
            "--pipeline_parallel_size (dedicated stage axis) is exclusive "
            "with --pipeline_parallel, --context_parallel, and "
            "--context_parallel_size"
        )
    if args.fsdp and (
        args.pipeline_parallel
        or args.context_parallel
        or args.context_parallel_size > 0
        or args.pipeline_parallel_size > 0
    ):
        parser.error(
            "--fsdp does not compose with pipeline/context parallelism; "
            "use it with plain DP or DP x TP (--model_parallel)"
        )

    import jax  # deferred so --help stays fast

    if args.compilation_cache:
        from ..utils.compile_cache import enable_compilation_cache

        enable_compilation_cache(args.compilation_cache)

    if args.multihost or args.coordinator_address or args.num_processes:
        # Must run before any other JAX call touches the backend
        # (reference equivalent: init_process_group, train.py:491-512).
        from ..parallel.multihost import initialize_multihost

        initialize_multihost(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
            auto=args.multihost,
        )

    from ..data.coco import CocoDetectionDataset, CocoTestDataset
    from ..models import init_detector_params
    from ..parallel import auto_mesh, batch_sharding, shard_params
    from ..utils.logging import setup_logger, setup_tensorboard
    from . import checkpoint as ckpt
    from .loop import (
        create_coco_mini,
        create_debug_subset,
        evaluate_dataset,
        run_training,
        validate,
    )
    from .state import make_optimizer
    from .step import make_eval_topk_step

    os.makedirs(args.output_dir, exist_ok=True)
    logger = setup_logger(args.log_dir or args.output_dir)
    # One TensorBoard writer per job, not per host.
    writer = (
        setup_tensorboard(args.log_dir or args.output_dir, args.experiment_name)
        if jax.process_index() == 0
        else None
    )

    if args.download_train_data or args.download_val_data or args.download_test_data:
        from ..tools.download import download_coco_dataset

        download_coco_dataset(
            args.data_dir,
            train=args.download_train_data,
            val=args.download_val_data,
            test=args.download_test_data,
            # Debug mode extracts only the needed image subset
            # (reference train.py:450-471).
            max_samples=args.debug_samples if args.debug else None,
        )
        if not args.train_images and args.download_train_data:
            args.train_images = os.path.join(args.data_dir, "train2017")
            args.train_annotations = os.path.join(
                args.data_dir, "annotations", "instances_train2017.json"
            )
        if not args.val_images and args.download_val_data:
            args.val_images = os.path.join(args.data_dir, "val2017")
            args.val_annotations = os.path.join(
                args.data_dir, "annotations", "instances_val2017.json"
            )

    det_cfg = build_detector_config(args)
    matcher_cfg = C.MatcherConfig(
        cost_class=args.set_cost_class, cost_bbox=args.set_cost_bbox,
        cost_giou=args.set_cost_giou, focal_alpha=args.focal_alpha,
        focal_gamma=args.focal_gamma,
        replicate_batch0_bug=args.ref_match_bug,
    )
    loss_cfg = C.LossConfig(
        focal_alpha=args.focal_alpha, focal_gamma=args.focal_gamma
    )
    # Debug mode: higher lr, more epochs (reference config.py:11-14,
    # train.py:1028-1034).
    num_epochs = args.num_epochs
    learning_rate = args.learning_rate
    if args.debug:
        num_epochs = num_epochs or 100
        learning_rate = learning_rate or args.debug_lr

    mesh_cfg = C.MeshConfig(
        model_parallel_size=args.model_parallel,
        context_parallel=args.context_parallel,
        context_parallel_size=args.context_parallel_size,
        pipeline_parallel=args.pipeline_parallel,
        pipeline_parallel_size=args.pipeline_parallel_size,
        pipeline_microbatches=args.pipeline_microbatches,
        pipeline_chunks=args.pipeline_chunks,
        fsdp=args.fsdp,
    )

    cfg = C.TrainConfig(
        detector=det_cfg,
        data=C.DataConfig(
            image_size=args.image_size,
            batch_size=args.batch_size,
            normalize=not (args.no_normalize or args.parity_mode),
            loader=args.loader,
            num_workers=args.num_workers,
            feed_dtype=args.feed_dtype,
            decode_backend="pil" if args.parity_mode else args.decode_backend,
        ),
        optim=C.OptimConfig(
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            lr_schedule=args.lr_schedule,
            warmup_steps=args.warmup_steps,
            min_lr_ratio=args.min_lr_ratio,
            ema_decay=args.ema_decay,
            skip_nonfinite=args.skip_nonfinite,
        ),
        matcher=matcher_cfg,
        loss=loss_cfg,
        mesh=mesh_cfg,
        augment=C.AugmentConfig(
            hflip_prob=args.hflip_prob,
            color_jitter=args.color_jitter,
            scale_jitter=args.scale_jitter,
            min_box_size=args.min_box_size,
        ),
        num_epochs=num_epochs or 50,
        debug=args.debug,
        share_aux_match=args.share_aux_match,
        checkpoint_every_epochs=args.checkpoint_frequency,
        save_on_preemption=args.save_on_preemption,
    )

    logger.info("devices: %s", jax.devices())
    logger.info("detector config: %s", det_cfg)

    # Model init (+ optional pretrained backbone import).
    params = init_detector_params(jax.random.key(cfg.seed), det_cfg)
    if args.import_reference_checkpoint:
        from ..models.import_reference import load_reference_detector_params

        params = load_reference_detector_params(
            args.import_reference_checkpoint, det_cfg, params
        )
        logger.info(
            "migrated full reference checkpoint from %s",
            args.import_reference_checkpoint,
        )
    elif args.pretrained_backbone:
        from ..models.import_torch import load_dinov2_backbone_params

        params["backbone"] = load_dinov2_backbone_params(
            args.pretrained_backbone, det_cfg.backbone, params["backbone"]
        )
        logger.info("imported pretrained backbone from %s", args.pretrained_backbone)
    elif not args.import_reference_checkpoint:
        logger.warning(
            "no --pretrained_backbone given: backbone is randomly initialized "
            "(this environment has no network access to fetch HF weights)"
        )

    # Checkpoint resume (reference train.py:686-747).
    start_epoch, start_batch, restored_opt, history = 0, 0, None, None
    if args.checkpoint and not args.skip_checkpoint_load:
        tx = make_optimizer(cfg.optim, det_cfg, params, learning_rate)
        opt_template = tx.init(params)
        params, restored_opt, start_epoch, history = ckpt.restore_checkpoint(
            args.checkpoint, params, opt_template
        )
        # A preemption checkpoint (train/preemption.py) records how many
        # steps of the interrupted epoch completed; the loop fast-forwards
        # the deterministic loader there, making resume exact.
        start_batch = int((history or {}).pop("_preempt_batch_index", 0))
        logger.info(
            "resumed from %s at epoch %d%s", args.checkpoint, start_epoch,
            f" batch {start_batch}" if start_batch else "",
        )

    normalize = not (args.no_normalize or args.parity_mode)
    ds_kwargs = dict(
        normalize=normalize,
        output_dtype=args.feed_dtype,
        decode_backend="pil" if args.parity_mode else args.decode_backend,
    )

    # ------------------------------------------------------------------
    # only_evaluate (reference train.py:750-890)
    # ------------------------------------------------------------------
    if args.only_evaluate:
        from ..parallel.sharding import check_tp_compatible

        if not (cfg.mesh.context_parallel or cfg.mesh.pipeline_parallel):
            # CP/PP repurpose the model axis for tokens/stages; TP
            # divisibility constraints only apply to tensor parallelism.
            check_tp_compatible(cfg.detector, args.model_parallel)
        if args.quantize == "int8":
            from ..models.detector import fold_detector_lora
            from ..models.quantize import quantize_detector_int8

            if args.model_parallel > 1:
                # TP + int8: param_shardings names kernel_q/w_scale
                # leaves (Megatron col/row), and the fused Pallas
                # quant-GEMM is disabled — opaque to the partitioner, it
                # would all-gather the K-sharded fc2 (ops/int8_gemm.py).
                from ..ops.int8_gemm import set_fused_enabled

                set_fused_enabled(False)
            params = quantize_detector_int8(
                fold_detector_lora(params, det_cfg), det_cfg
            )
            logger.info("serving with int8-quantized backbone (W8A8)")
        mesh = auto_mesh(args.batch_size, args.model_parallel, cfg=cfg.mesh)
        eval_step = make_eval_topk_step(
            cfg, mesh=mesh, parity_mode=args.parity_mode
        )
        params = shard_params(params, mesh, cfg=cfg.mesh)
        bsh = batch_sharding(mesh, cfg=cfg.mesh)
        if args.testdev_images:
            ds = CocoTestDataset(
                args.testdev_images, None, args.image_size, **ds_kwargs
            )
            if args.test_mini:
                idx = create_debug_subset(len(ds), args.test_mini_size)
                idx_file = os.path.join(args.output_dir, "test_mini_indices.json")
                with open(idx_file, "w") as f:
                    json.dump({"indices": idx}, f)
                ds = CocoTestDataset(
                    args.testdev_images, None, args.image_size,
                    indices=idx, **ds_kwargs,
                )
            out_file = os.path.join(args.output_dir, "testdev_predictions.json")
            results = evaluate_dataset(
                eval_step, params, ds, args.batch_size, ds.label_to_cat_id,
                output_file=out_file, parity_mode=args.parity_mode,
                batch_sharding_=bsh,
            )
            logger.info("wrote %d detections to %s", len(results), out_file)
        elif args.val_images:
            indices = None
            ds = CocoDetectionDataset(
                args.val_images, args.val_annotations, args.image_size,
                **ds_kwargs,
            )
            if args.use_coco_mini:
                indices = create_coco_mini(
                    len(ds), args.coco_mini_size, args.coco_mini_seed,
                    args.coco_mini_indices_file, args.output_dir,
                )
            elif args.debug:
                indices = create_debug_subset(len(ds), args.debug_samples)
            if indices is not None:
                ds = CocoDetectionDataset(
                    args.val_images, args.val_annotations, args.image_size,
                    indices=indices, **ds_kwargs,
                )
            metrics = validate(
                eval_step, params, ds, args.batch_size, start_epoch,
                args.output_dir, parity_mode=args.parity_mode,
                batch_sharding_=bsh,
            )
            logger.info("evaluation metrics: %s", metrics)
        else:
            logger.error("--only_evaluate needs --val_images or --testdev_images")
            return 1
        return 0

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    if not args.packed_train_data and (
        not args.train_images or not args.train_annotations
    ):
        logger.error("--train_images and --train_annotations are required "
                     "(or --packed_train_data)")
        return 1

    def make_train_ds(indices=None):
        if args.packed_train_data:
            from ..data.packed import PackedDataset

            return PackedDataset(
                args.packed_train_data, indices=indices,
                output_dtype=args.feed_dtype, normalize=normalize,
                image_size=args.image_size, max_boxes=cfg.data.max_boxes,
            )
        return CocoDetectionDataset(
            args.train_images, args.train_annotations, args.image_size,
            max_boxes=cfg.data.max_boxes, indices=indices, **ds_kwargs,
        )

    train_ds = make_train_ds()
    indices = None
    if args.debug:
        indices = create_debug_subset(len(train_ds), args.debug_samples)
        logger.info("debug mode: %d-sample overfit subset", len(indices))
    elif args.use_coco_mini:
        indices = create_coco_mini(
            len(train_ds), args.coco_mini_size, args.coco_mini_seed,
            args.coco_mini_indices_file, args.output_dir,
        )
    if indices is not None:
        train_ds = make_train_ds(indices)

    val_ds = None
    if args.packed_val_data:
        from ..data.packed import PackedDataset

        val_ds = PackedDataset(
            args.packed_val_data, output_dtype=args.feed_dtype,
            normalize=normalize, image_size=args.image_size,
            max_boxes=cfg.data.max_boxes,
        )
    elif args.val_images and args.val_annotations:
        val_ds = CocoDetectionDataset(
            args.val_images, args.val_annotations, args.image_size,
            max_boxes=cfg.data.max_boxes, **ds_kwargs,
        )
        if args.debug:
            # Debug mode validates on the train subset (overfit check,
            # reference train.py:897-900).
            val_ds = train_ds

    val_freq = args.val_frequency
    if args.debug:
        val_freq = max(1, args.val_frequency // 5)  # reference train.py:1030

    run_training(
        cfg,
        params,
        train_ds,
        val_ds,
        args.output_dir,
        writer=writer,
        num_epochs=num_epochs,
        learning_rate=learning_rate,
        start_epoch=start_epoch,
        start_batch=start_batch,
        restored_opt_state=restored_opt,
        metrics_history=history,
        model_parallel=args.model_parallel,
        val_frequency=val_freq,
        log_frequency=args.log_frequency,
        memory_monitor=args.memory_monitor,
        parity_mode=args.parity_mode,
        log_images_enabled=args.log_images,
        log_images_frequency=args.log_images_frequency,
        device_cache=args.device_cache,
        steps_per_dispatch=args.steps_per_dispatch,
        device_cache_layout=args.device_cache_layout,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
