"""Configuration for the TPU-native DINOv2 object detector.

Mirrors the hyperparameter surface of the reference `dino_detector/config.py`
(all defaults match reference values at config.py:1-57), re-expressed as
frozen dataclasses so configs are hashable and safe to close over in jitted
functions.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


# ---------------------------------------------------------------------------
# Backbone (DINOv2 ViT) architecture table.
# Matches the HF checkpoints the reference loads by name
# (reference: dino_detector/models/dinov2_backbone.py:17-27).
# ---------------------------------------------------------------------------
_VIT_VARIANTS = {
    # name: (hidden_dim, depth, heads, mlp_ratio, ffn_type)
    "small": (384, 12, 6, 4.0, "mlp"),
    "base": (768, 12, 12, 4.0, "mlp"),
    "large": (1024, 24, 16, 4.0, "mlp"),
    "giant": (1536, 40, 24, 8 / 3, "swiglu"),
}


def variant_from_model_name(model_name: str) -> str:
    """Extract the ViT variant from an HF-style model name.

    Reference behavior: substring match on the model name with a fallback to
    'base' (dino_detector/models/dinov2_backbone.py:17-27).
    """
    for v in ("small", "base", "large", "giant"):
        if v in model_name:
            return v
    return "base"


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """DINOv2 ViT backbone + LoRA configuration."""

    variant: str = "base"
    image_size: int = 224
    patch_size: int = 14
    # LoRA (reference: config.py:23-24; scaling is `alpha`, NOT alpha/r,
    # matching dino_detector/utils.py:70).
    lora_r: int = 2
    lora_alpha: float = 1.0
    # Number of final encoder blocks that receive LoRA adapters
    # (reference: dino_detector/models/dinov2_backbone.py:45-51).
    lora_last_n_blocks: int = 2
    # Optional projection to the decoder dim (reference:
    # dino_detector/models/dinov2_backbone.py:33-37). None = no projection
    # when dims already match.
    target_dim: Optional[int] = None
    layerscale_init: float = 1.0
    drop_cls_token: bool = True  # fix of reference quirk (SURVEY.md §7.5)
    dtype: str = "float32"  # compute dtype for activations
    # Explicit architecture overrides (None = use the variant table). Used
    # for custom/tiny architectures, e.g. importer parity tests.
    # lax.scan unroll factor over depth. Full unroll removes the
    # dynamic-update-slice gradient stacking the scan backward otherwise
    # performs (measured ~15ms/step on ViT-B at batch 32).
    scan_unroll: int = 1
    # 'factored': base GEMM + rank-r LoRA matmuls (cheapest backward for
    # frozen bases). 'fold': W_eff = W + alpha*A@B materialized per step,
    # one GEMM per linear (fewer skinny matmuls; backward computes dW_eff).
    lora_mode: str = "factored"
    # tanh-approximate GELU: 7x faster on the TPU VPU than the exact erf
    # form (0.056 vs 0.393 ms on [32,257,3072]) with max abs deviation
    # 5e-4 — an order of magnitude below bf16 resolution. Set False for
    # bit-level parity runs against torch's exact nn.GELU (HF Dinov2).
    gelu_approximate: bool = True
    # int8 (W8A8) forward for the FROZEN prefix blocks during training:
    # the blocks below the LoRA boundary are stop-gradiented, so their
    # forward is pure inference and the serving quantization scheme
    # (models/quantize.py) applies — weights quantize in-graph per step
    # (they are step inputs), activations per token. Opt-in; the
    # adapted suffix and everything with gradients stays bf16/fp32.
    prefix_int8: bool = False
    hidden_dim_override: Optional[int] = None
    depth_override: Optional[int] = None
    num_heads_override: Optional[int] = None
    mlp_ratio_override: Optional[float] = None
    # "mlp" | "swiglu" | "moe" (None = variant table). "moe" swaps the
    # dense FFN of the ADAPTED last `lora_last_n_blocks` blocks for a
    # mixture-of-experts FFN (ops/moe.py, sparse-upcycling layout: the
    # frozen prefix keeps its dense, pretrained-loadable FFN; set
    # lora_last_n_blocks = depth for full-depth MoE) — beyond-reference
    # capability; experts shard over the mesh's model axis (expert
    # parallelism, parallel/sharding.py "moe" rules).
    ffn_type_override: Optional[str] = None
    # MoE knobs (active only when ffn_type == "moe").
    moe_num_experts: int = 8
    moe_top_k: int = 2
    # Per-expert slot budget: capacity = ceil(top_k * tokens/expert * cf).
    moe_capacity_factor: float = 1.25
    # Weight of the router load-balance auxiliary loss (Switch/GShard
    # E * sum_e f_e * P_e) added to the training objective.
    moe_aux_weight: float = 0.01

    @property
    def hidden_dim(self) -> int:
        return self.hidden_dim_override or _VIT_VARIANTS[self.variant][0]

    @property
    def depth(self) -> int:
        return self.depth_override or _VIT_VARIANTS[self.variant][1]

    @property
    def num_heads(self) -> int:
        return self.num_heads_override or _VIT_VARIANTS[self.variant][2]

    @property
    def mlp_ratio(self) -> float:
        return self.mlp_ratio_override or _VIT_VARIANTS[self.variant][3]

    @property
    def ffn_type(self) -> str:
        return self.ffn_type_override or _VIT_VARIANTS[self.variant][4]

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_dim * self.mlp_ratio)

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # +1 CLS

    @property
    def out_dim(self) -> int:
        return self.target_dim if self.target_dim is not None else self.hidden_dim


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """DETR decoder configuration (reference: config.py:26-36)."""

    hidden_dim: int = 768
    num_queries: int = 50
    num_layers: int = 3
    num_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.1
    num_classes: int = 91
    use_deformable: bool = True
    n_points: int = 2
    # The reference accidentally ties all deformable decoder layers to a
    # single weight instance (deformable_attention.py:284). We default to
    # untied (fixed) weights; set True to reproduce reference behavior.
    tie_layer_weights: bool = False
    dtype: str = "float32"
    # Auxiliary decoding losses (Deformable-DETR §4 / DETR §A.2): apply
    # the shared prediction heads + set criterion to every intermediate
    # decoder layer's output during training. Known to add several AP on
    # COCO. Off by default — the reference has no equivalent
    # (detr_decoder.py supervises only the final layer).
    aux_loss: bool = False


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Hungarian matcher costs (reference: config.py:43-50)."""

    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Assignment solver: 'jv' (exact Jonker-Volgenant, sequential
    # augmenting paths), 'auction' (eps-optimal parallel bidding rounds,
    # ~12x faster at COCO GT density), or 'auto' (jv below
    # auction_threshold padded GT slots, auction at/above it). Measured
    # crossover on v5e (B=32, Q=50): G=32 jv 4.1 ms vs auction 7.6; G=64
    # jv 35.5 vs auction 3.0 — 40 keeps jv only where it clearly wins.
    assignment: str = "auto"
    auction_threshold: int = 40
    # Reproduce the reference's batch-0 matching bug for A/B studies:
    # its flattened cost matrix is sliced C[:num_queries]
    # (matching.py:63-64,102), so EVERY image in the batch is matched
    # using image 0's predictions against its own GTs. Off (fixed) by
    # default; --ref_match_bug enables it to quantify the bug's
    # training-accuracy cost (see PARITY.md).
    replicate_batch0_bug: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Set-criterion loss weights (reference: config.py:52-57)."""

    weight_ce: float = 1.0
    weight_bbox: float = 5.0
    weight_giou: float = 2.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Full detector = backbone + decoder (reference: models/detector.py)."""

    backbone: BackboneConfig = BackboneConfig()
    decoder: DecoderConfig = DecoderConfig()

    def __post_init__(self):
        # The decoder consumes backbone features; dims must agree
        # (reference: models/detector.py:38-56 projects backbone -> hidden).
        if self.backbone.out_dim != self.decoder.hidden_dim:
            raise ValueError(
                f"backbone out_dim {self.backbone.out_dim} != decoder "
                f"hidden_dim {self.decoder.hidden_dim}; set "
                f"backbone.target_dim to the decoder dim."
            )


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline configuration."""

    image_size: int = 224
    # Static-shape padding budget for per-image GT boxes. COCO's densest
    # image has ~93 annotations; 100 covers everything.
    max_boxes: int = 100
    # Reference quirk (SURVEY.md §7.4): the reference does NOT apply
    # ImageNet normalization. We do by default; parity mode disables.
    normalize: bool = True
    batch_size: int = 8  # per reference config.py:7 (per device)
    num_workers: int = 4
    shuffle_buffer: int = 1000
    # Input pipeline backend: "threaded" (data/loader.py, zero deps).
    # A Grain backend existed through round 4 but lost in every measured
    # configuration (45 img/s with worker processes / 348 in-process vs
    # 424 threaded — BENCH.md input-pipeline ledger) and was removed.
    loader: str = "threaded"
    # Host->device image feed dtype. "uint8" ships raw bytes and runs
    # /255 + normalization in-jit (train/step.py prep_images): 4x less
    # transfer volume and host fp32 math. "float32" preprocesses on the
    # host (reference behavior, dataset.py:55).
    feed_dtype: str = "uint8"
    # JPEG decode backend: "auto" = libjpeg scaled decode via cv2 +
    # SIMD resize (2.3x PIL, resampling-level pixel differences);
    # "pil" = exact reference decode (full PIL + bilinear).
    decode_backend: str = "auto"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer settings (reference: config.py:5, :39-41, train.py:1000)."""

    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    gradient_clip_val: float = 1.0
    gradient_accumulation_steps: int = 1
    # The reference uses Adam with a weight_decay kwarg (train.py:1000-1004),
    # i.e. L2-regularized Adam, and no LR schedule.
    optimizer: str = "adam"
    # LR schedule (beyond reference — train.py:1000-1004 has NO
    # scheduler): 'constant' (reference parity, default), 'cosine'
    # (warmup + cosine decay to min_lr_ratio * lr), or 'linear'
    # (warmup + linear decay).
    lr_schedule: str = "constant"
    # Linear warmup from 0 over this many optimizer steps (applies to
    # every schedule, including 'constant').
    warmup_steps: int = 0
    # Total optimizer steps for the decay schedules; 0 = filled in by
    # the training loop (steps/epoch x epochs / accumulation).
    total_steps: int = 0
    # Decay floor as a fraction of the peak learning rate.
    min_lr_ratio: float = 0.0
    # Exponential moving average of the TRAINABLE weights (beyond
    # reference): 0 = off; typical 0.999. Evaluation/final save use the
    # EMA-merged weights. Frozen leaves are not duplicated (the EMA tree
    # stores scalar placeholders for them — they never move).
    ema_decay: float = 0.0
    # Production robustness (beyond reference — train.py:1101 applies
    # whatever backward produced): when True, an optimizer step whose
    # gradients contain any NaN/Inf is skipped entirely — params AND
    # Adam moments keep their previous values (one bad batch would
    # otherwise poison the moment estimates permanently) — and the
    # step's metrics report nonfinite_skip=1, which the training loop
    # accumulates and logs. Zero extra HBM traffic: the scalar select
    # fuses into the update. Wired in train/step.py; CLI
    # --skip_nonfinite.
    skip_nonfinite: bool = False


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. data = DP axis, model = TP axis."""

    data_axis: str = "data"
    model_axis: str = "model"
    context_axis: str = "context"
    stage_axis: str = "stage"
    model_parallel_size: int = 1
    # Dedicated context-parallel axis size (> 0 enables the THREE-axis
    # mesh ('data', 'context', 'model')): ring attention shards the
    # backbone token dim over 'context' while Megatron TP shards
    # heads/FFN over 'model' — the two compose (DP x CP x TP). Heads
    # rotate with neither: the ring's ppermute runs per head shard.
    # 0 = legacy mode, where `context_parallel` (below) repurposes the
    # 2-axis mesh's model axis for tokens instead of tensor shards.
    context_parallel_size: int = 0
    # Dedicated pipeline-stage axis size (> 0 enables the THREE-axis
    # mesh ('data', 'stage', 'model')): the backbone depth streams over
    # 'stage' while heads/FFN keep Megatron TP specs over 'model'
    # (PP x TP). The pipeline's shard_map goes manual over
    # (data, stage) only; 'model' stays an AUTO axis, so the per-stage
    # GEMMs auto-partition and attention runs a NESTED shard_map over
    # the head shards (parallel/pipeline.py auto_axes).
    # 0 = legacy mode, where `pipeline_parallel` (below) repurposes the
    # 2-axis mesh's model axis for stages.
    pipeline_parallel_size: int = 0
    # Context (sequence) parallelism: backbone attention runs as ring
    # attention with the token dim sharded over the *model* axis
    # (ops/ring_attention.py), for inputs whose [S, S] attention exceeds
    # one chip. Repurposes the model axis: parameters stay replicated
    # over it (mutually exclusive with tensor parallelism), and the
    # backbone token count must divide model_parallel_size.
    context_parallel: bool = False
    # Pipeline parallelism: the backbone depth is split into
    # model_parallel_size consecutive stages; microbatches stream
    # through them GPipe-style (parallel/pipeline.py). Also repurposes
    # the model axis (exclusive with TP and context_parallel); the
    # backbone depth must divide the stage count.
    pipeline_parallel: bool = False
    # Microbatches for the pipeline schedule (0 -> stage count).
    pipeline_microbatches: int = 0
    # FSDP / ZeRO-3 (beyond reference): additionally shard every large
    # parameter leaf (and, by inheritance, its Adam moments) over the
    # 'data' axis — GSPMD all-gathers weights on use and reduce-scatters
    # gradients, cutting per-device param+optimizer memory ~1/|data|
    # at unchanged math. Composes with TP; not with the pipeline/context
    # shard_map paths (parallel/sharding.py raises).
    fsdp: bool = False
    # Chunks per pipeline stage (interleaved schedule): 1 = GPipe; v > 1
    # gives each device v non-consecutive depth chunks and a v-times
    # smaller bubble (parallel/pipeline.py). Requires depth divisible by
    # stages*chunks and microbatches divisible by stages.
    pipeline_chunks: int = 1

    def __post_init__(self):
        if self.context_parallel and self.pipeline_parallel:
            raise ValueError(
                "context_parallel and pipeline_parallel both claim the "
                "model axis — enable at most one"
            )
        if self.context_parallel_size > 0 and self.context_parallel:
            raise ValueError(
                "use either context_parallel (legacy: ring over the model "
                "axis) or context_parallel_size (dedicated context axis, "
                "composable with TP) — not both"
            )
        if self.context_parallel_size > 0 and self.pipeline_parallel:
            raise ValueError(
                "context_parallel_size and pipeline_parallel cannot be "
                "combined (the pipeline claims the model axis for stages)"
            )
        if self.pipeline_parallel_size > 0 and (
            self.pipeline_parallel
            or self.context_parallel
            or self.context_parallel_size > 0
        ):
            raise ValueError(
                "pipeline_parallel_size (dedicated stage axis) is "
                "exclusive with pipeline_parallel, context_parallel, and "
                "context_parallel_size"
            )


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Train-time augmentation (beyond reference — the reference's whole
    transform pipeline is Resize + ToTensor, train.py:584-587, with no
    augmentation). All augmentations run ON DEVICE inside the jitted
    train step (data/augment.py); all default off for reference parity.
    """

    # Per-image horizontal flip probability (boxes mirrored with it).
    hflip_prob: float = 0.0
    # Brightness/contrast/saturation factors ~ U[1-s, 1+s]; 0 = off.
    color_jitter: float = 0.0
    # Random aspect-preserving zoom ~ U[1-s, 1+s] with random placement
    # (zoom-out pads black, zoom-in crops); boxes follow and are clipped.
    scale_jitter: float = 0.0
    # Boxes whose clipped width or height (normalized) falls below this
    # after scale jitter are dropped (valid bit cleared).
    min_box_size: float = 1e-3

    @property
    def enabled(self) -> bool:
        return (
            self.hflip_prob > 0
            or self.color_jitter > 0
            or self.scale_jitter > 0
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Top-level training configuration."""

    detector: DetectorConfig = DetectorConfig()
    data: DataConfig = DataConfig()
    optim: OptimConfig = OptimConfig()
    matcher: MatcherConfig = MatcherConfig()
    loss: LossConfig = LossConfig()
    mesh: MeshConfig = MeshConfig()
    augment: AugmentConfig = AugmentConfig()
    num_epochs: int = 50
    seed: int = 42
    # Debug/overfit mode (reference: config.py:11-14)
    debug: bool = False
    debug_samples: int = 32
    debug_epochs: int = 100
    debug_lr: float = 5e-4
    # Checkpointing cadence (reference: train.py:1279-1288)
    checkpoint_every_epochs: int = 10
    val_frequency: int = 5
    log_frequency: int = 10
    # Rematerialize backbone blocks in the backward pass (trade FLOPs for
    # HBM at 518px / large models).
    use_remat: bool = False
    # SIGTERM -> synchronous checkpoint at the next step boundary + clean
    # exit (train/preemption.py); resume restarts the interrupted epoch.
    # The reference handles no signals (train.py:1279-1288 saves only on
    # its epoch cadence).
    save_on_preemption: bool = True
    # Auxiliary (deep-supervision) losses reuse the FINAL decoder layer's
    # assignment instead of solving a fresh match per layer. DETR matches
    # each layer independently (the default, exact); sharing removes L-1
    # matcher solves per step, which matters at COCO GT density where the
    # matcher is a large step fraction (BENCH.md).
    share_aux_match: bool = False


def lightweight_detector_config(
    num_classes: int = 91,
    use_deformable: bool = True,
    n_points: int = 2,
    image_size: int = 224,
) -> DetectorConfig:
    """CPU-runnable tiny config, mirroring the reference `--lightweight`
    override table (train.py:607-646): dinov2-small backbone, decoder dim
    256, 25 queries, 2 layers, 4 heads, lora_r 1."""
    return DetectorConfig(
        backbone=BackboneConfig(
            variant="small",
            image_size=image_size,
            lora_r=1,
            lora_alpha=1.0,
            target_dim=256,
        ),
        decoder=DecoderConfig(
            hidden_dim=256,
            num_queries=25,
            num_layers=2,
            num_heads=4,
            dim_feedforward=512,
            num_classes=num_classes,
            use_deformable=use_deformable,
            n_points=n_points,
        ),
    )


def detector_config_for_model_name(
    model_name: str,
    num_classes: int = 91,
    hidden_dim: Optional[int] = 768,
    num_queries: int = 50,
    num_layers: int = 3,
    num_heads: int = 8,
    dim_feedforward: int = 1024,
    dropout: float = 0.1,
    use_deformable: bool = True,
    n_points: int = 2,
    lora_r: int = 2,
    lora_alpha: float = 1.0,
    image_size: int = 224,
) -> DetectorConfig:
    """Build a DetectorConfig from an HF-style model name, reproducing the
    reference's variant-based dimension defaulting (models/detector.py:25-35).
    """
    variant = variant_from_model_name(model_name)
    backbone_dim = _VIT_VARIANTS[variant][0]
    if hidden_dim is None:
        hidden_dim = backbone_dim
    target_dim = hidden_dim if hidden_dim != backbone_dim else None
    return DetectorConfig(
        backbone=BackboneConfig(
            variant=variant,
            image_size=image_size,
            lora_r=lora_r,
            lora_alpha=lora_alpha,
            target_dim=target_dim,
        ),
        decoder=DecoderConfig(
            hidden_dim=hidden_dim,
            num_queries=num_queries,
            num_layers=num_layers,
            num_heads=num_heads,
            dim_feedforward=dim_feedforward,
            dropout=dropout,
            num_classes=num_classes,
            use_deformable=use_deformable,
            n_points=n_points,
        ),
    )
