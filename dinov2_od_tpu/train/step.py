"""Jitted train / eval steps under the device mesh.

The full training step — forward, Hungarian matching, set loss, backward,
clip, Adam — is one compiled XLA program (reference equivalent:
train.py:1067-1110, which crosses host boundaries twice per step for the
scipy matcher and per-batch `.item()` logging). Data parallelism comes from
the batch arrays being sharded over the mesh's 'data' axis: the loss sums
are global, so XLA inserts the gradient all-reduce exactly where DDP would
(train.py:677) and the num_boxes all-reduce of losses.py:228-230 falls out
of `jnp.sum` over the global batch.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..models.detector import detector_apply
from ..ops.losses import set_criterion
from .state import TrainState, mask_gradients, stop_gradient_frozen

Batch = Dict[str, jnp.ndarray]
# Expected batch keys:
#   images: [B, H, W, 3] float32 (preprocessed) or uint8 (raw bytes;
#           /255 + normalization happen in-jit via prep_images)
#   labels: [B, G] int32
#   boxes:  [B, G, 4] float32 cxcywh in [0, 1]
#   valid:  [B, G] bool


def prep_images(images: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    """Device-side image preprocessing for raw uint8 feeds.

    The host ships bytes (4x less host->device traffic than fp32 — the
    dominant cost on narrow links) and XLA fuses /255 + normalize into
    the first consumer. Float inputs are passed through untouched: the
    convention is integer = raw, float = already preprocessed (the
    reference does both on host CPU workers, dataset.py:55,
    train.py:584-587)."""
    if not jnp.issubdtype(images.dtype, jnp.integer):
        return images
    x = images.astype(jnp.float32) / 255.0
    if normalize:
        from ..data.coco import IMAGENET_MEAN, IMAGENET_STD

        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x


def _unit_interval_images(images: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    """Bring a batch to un-normalized [0,1] RGB for augmentation.

    int feeds are raw bytes; float feeds follow the prep_images
    convention (already normalized when cfg.data.normalize) and are
    un-normalized by the exact inverse affine — XLA fuses both affine
    round-trips into the surrounding elementwise work."""
    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) / 255.0
    if normalize:
        from ..data.coco import IMAGENET_MEAN, IMAGENET_STD

        return images * IMAGENET_STD + IMAGENET_MEAN
    return images


def _normalize_unit_images(images: jnp.ndarray, normalize: bool) -> jnp.ndarray:
    if normalize:
        from ..data.coco import IMAGENET_MEAN, IMAGENET_STD

        return (images - IMAGENET_MEAN) / IMAGENET_STD
    return images


def _cp_kwargs(cfg: TrainConfig, mesh):
    """detector_apply kwargs for context or pipeline parallelism over
    the model axis, when enabled in cfg.mesh; {} otherwise."""
    if mesh is None:
        return {}
    if cfg.mesh.context_parallel_size > 0:
        # Three-axis mesh: ring attention over the dedicated context
        # axis, composed with Megatron TP over the model axis when its
        # size > 1 (the ring runs per head shard; see
        # ops/ring_attention.py head_axis).
        kw = {
            "attn_impl": "ring",
            "mesh": mesh,
            "seq_axis": cfg.mesh.context_axis,
            "batch_axis": cfg.mesh.data_axis,
        }
        if dict(mesh.shape).get(cfg.mesh.model_axis, 1) > 1:
            kw["tp_axis"] = cfg.mesh.model_axis
        return kw
    if cfg.mesh.pipeline_parallel_size > 0:
        # Three-axis mesh: backbone depth staged over the dedicated
        # stage axis, composed with Megatron TP over the model axis when
        # its size > 1 (the pipeline's shard_map leaves 'model' auto;
        # see parallel/pipeline.py auto_axes).
        kw = {
            "mesh": mesh,
            "pipe_axis": cfg.mesh.stage_axis,
            "pipe_microbatches": cfg.mesh.pipeline_microbatches,
            "pipe_chunks": cfg.mesh.pipeline_chunks,
        }
        if dict(mesh.shape).get(cfg.mesh.model_axis, 1) > 1:
            kw["tp_axis"] = cfg.mesh.model_axis
            kw["batch_axis"] = cfg.mesh.data_axis
        return kw
    if cfg.mesh.context_parallel:
        return {
            "attn_impl": "ring",
            "mesh": mesh,
            "seq_axis": cfg.mesh.model_axis,
            # Keep attention compute data-sharded under DP x CP: without
            # this the shard_map in_specs all-gather the batch over the
            # data axis (dp-times redundant compute per device).
            "batch_axis": cfg.mesh.data_axis,
        }
    if cfg.mesh.pipeline_parallel:
        return {
            "mesh": mesh,
            "pipe_axis": cfg.mesh.model_axis,
            "pipe_microbatches": cfg.mesh.pipeline_microbatches,
            "pipe_chunks": cfg.mesh.pipeline_chunks,
        }
    if cfg.mesh.model_axis in mesh.shape and mesh.shape[cfg.mesh.model_axis] > 1:
        # Tensor parallelism: route backbone attention through the
        # head-sharded shard_map (ops/attention.py tp_axis) so the Pallas
        # kernel cannot be silently all-gathered by the SPMD partitioner.
        return {
            "mesh": mesh,
            "tp_axis": cfg.mesh.model_axis,
            "batch_axis": cfg.mesh.data_axis,
        }
    return {}


def make_train_step(
    cfg: TrainConfig, tx: optax.GradientTransformation, mesh=None,
    jit: bool = True,
):
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    `mesh` is only needed when cfg.mesh.context_parallel is set (ring
    attention's shard_map needs the concrete mesh object). `jit=False`
    returns the raw traceable body (for embedding in a lax.scan —
    train/device_cache.py's multi-step dispatch)."""
    det_cfg = cfg.detector
    num_classes = det_cfg.decoder.num_classes
    cp = _cp_kwargs(cfg, mesh)
    if cfg.augment.enabled:
        # Import OUTSIDE the traced function: module import creates
        # constants, and doing that mid-trace leaks the trace.
        from ..data.augment import augment_batch

    def train_step(
        state: TrainState, batch: Batch, rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)

        # Device-side augmentation (data/augment.py; off by default —
        # every branch is static on cfg so the disabled path is
        # bit-identical to pre-augmentation builds).
        boxes, valid = batch["boxes"], batch["valid"]
        if cfg.augment.enabled:
            aug_rng = jax.random.fold_in(step_rng, 0x5A6)
            x01 = _unit_interval_images(batch["images"], cfg.data.normalize)
            x01, boxes, valid = augment_batch(
                aug_rng, x01, boxes, valid, cfg.augment
            )
            images = _normalize_unit_images(x01, cfg.data.normalize)
        else:
            images = prep_images(batch["images"], cfg.data.normalize)

        def loss_fn(params):
            params = stop_gradient_frozen(params, det_cfg)
            out = detector_apply(
                params,
                det_cfg,
                images,
                rng=step_rng,
                deterministic=False,
                use_remat=cfg.use_remat,
                **cp,
            )
            losses, final_match = set_criterion(
                out["pred_logits"],
                out["pred_boxes"],
                batch["labels"],
                boxes,
                valid,
                matcher_cfg=cfg.matcher,
                loss_cfg=cfg.loss,
                num_classes=num_classes,
                return_match=True,
            )
            total = losses["loss"]
            # Deep supervision (DecoderConfig.aux_loss): each intermediate
            # decoder layer is matched and scored independently with the
            # same weights (Deformable-DETR §4), summed into the total.
            # cfg.share_aux_match reuses the final layer's assignment
            # instead (L-1 fewer matcher solves; see BENCH.md).
            for i, aux in enumerate(out.get("aux_outputs", [])):
                aux_losses = set_criterion(
                    aux["pred_logits"],
                    aux["pred_boxes"],
                    batch["labels"],
                    boxes,
                    valid,
                    matcher_cfg=cfg.matcher,
                    loss_cfg=cfg.loss,
                    num_classes=num_classes,
                    match=final_match if cfg.share_aux_match else None,
                )
                total = total + aux_losses["loss"]
                losses[f"loss_aux_{i}"] = aux_losses["loss"]
            if "moe_aux" in out:
                # Router load-balance loss (ops/moe.py; weight from
                # BackboneConfig.moe_aux_weight).
                moe_term = (
                    det_cfg.backbone.moe_aux_weight * out["moe_aux"]
                )
                total = total + moe_term
                losses["loss_moe_aux"] = out["moe_aux"]
            losses["loss"] = total
            return total, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = mask_gradients(grads, state.params, det_cfg)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # Re-mask the *updates*: weight decay (add_decayed_weights) re-adds
        # a -lr*wd*param term even where the gradient was zeroed, which
        # would slowly decay non-adapted blocks' LoRA factors. The
        # reference's optimizer never sees those params (requires_grad
        # gating, train.py:1000-1004).
        updates = mask_gradients(updates, state.params, det_cfg)
        params = optax.apply_updates(state.params, updates)

        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        if cfg.optim.skip_nonfinite:
            # Non-finite guard (OptimConfig.skip_nonfinite; the reference
            # applies whatever backward produced, train.py:1101): if ANY
            # gradient leaf holds NaN/Inf the whole optimizer step is
            # discarded — params AND optimizer state (Adam moments,
            # accumulation buffers) keep their previous values, so one
            # poisoned batch cannot corrupt the moment estimates. The
            # scalar select fuses into the update; step/rng still advance
            # so the bad batch is not resampled.
            finite = jax.tree_util.tree_reduce(
                lambda acc, g: acc & jnp.all(jnp.isfinite(g)),
                grads,
                jnp.asarray(True),
            )
            _sel = lambda new, old: jnp.where(finite, new, old)
            params = jax.tree_util.tree_map(_sel, params, state.params)
            opt_state = jax.tree_util.tree_map(
                _sel, opt_state, state.opt_state
            )
            metrics["nonfinite_skip"] = (~finite).astype(jnp.float32)
        ema = state.ema
        if cfg.optim.ema_decay > 0 and ema is not None:
            from .state import update_ema

            ema = update_ema(ema, params, det_cfg, cfg.optim.ema_decay)
            if cfg.optim.skip_nonfinite:
                # A skipped step must not move the EMA either.
                ema = jax.tree_util.tree_map(_sel, ema, state.ema)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(cfg: TrainConfig, mesh=None):
    """Build the jitted eval step: params, images -> raw predictions.

    Device-side forward only; post-processing (sigmoid/threshold/rescale)
    lives in evaluation.postprocess so it can also run fused here later.
    """
    det_cfg = cfg.detector
    cp = _cp_kwargs(cfg, mesh)

    @jax.jit
    def eval_step(params, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return detector_apply(
            params,
            det_cfg,
            prep_images(images, cfg.data.normalize),
            deterministic=True,
            **cp,
        )

    return eval_step


def make_eval_topk_step(
    cfg: TrainConfig,
    mesh=None,
    max_detections: int = 100,
    parity_mode: bool = False,
    jit: bool = True,
):
    """Eval step with the detection top-k fused in: params, images,
    orig_sizes -> {"topk": [B, K, 6]} packed as (score, label, x, y, w,
    h) along the last dim (label exact in f32 — class ids < 2^24).

    evaluate_dataset's hot path: one device dispatch per batch, and ONE
    compact array crosses the device->host link (~30x less D2H than
    [B, Q, C] logits). The packing matters on high-RTT links: each
    np.asarray is its own round trip, so separate scores/labels/boxes
    readbacks cost 3x the latency (measured on this ~30ms relay:
    158 img/s end-to-end split vs 102 for the legacy re-upload loop;
    packed, the readback is one crossing per batch)."""
    det_cfg = cfg.detector
    cp = _cp_kwargs(cfg, mesh)
    from ..evaluation.postprocess import select_topk_detections

    def eval_topk_step(
        params, images: jnp.ndarray, orig_sizes: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        out = detector_apply(
            params,
            det_cfg,
            prep_images(images, cfg.data.normalize),
            deterministic=True,
            **cp,
        )
        scores, labels, boxes = select_topk_detections(
            out["pred_logits"], out["pred_boxes"], orig_sizes,
            max_detections=max_detections, parity_mode=parity_mode,
        )
        return {
            "topk": jnp.concatenate(
                [
                    scores[..., None].astype(jnp.float32),
                    labels[..., None].astype(jnp.float32),
                    boxes.astype(jnp.float32),
                ],
                axis=-1,
            )
        }

    if not jit:
        return eval_topk_step
    return jax.jit(eval_topk_step)


def make_loss_eval_step(cfg: TrainConfig):
    """Loss on a batch without updating (validation loss curves)."""
    det_cfg = cfg.detector

    @jax.jit
    def loss_eval_step(params, batch: Batch) -> Dict[str, jnp.ndarray]:
        out = detector_apply(
            params,
            det_cfg,
            prep_images(batch["images"], cfg.data.normalize),
            deterministic=True,
        )
        return set_criterion(
            out["pred_logits"],
            out["pred_boxes"],
            batch["labels"],
            batch["boxes"],
            batch["valid"],
            matcher_cfg=cfg.matcher,
            loss_cfg=cfg.loss,
            num_classes=det_cfg.decoder.num_classes,
        )

    return loss_eval_step
