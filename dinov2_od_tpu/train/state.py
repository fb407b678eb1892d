"""Train state and optimizer.

Optimizer semantics mirror the reference (train.py:1000-1004): Adam with
torch-style L2 weight decay (decay added to the *gradient* before the
moment estimates — torch Adam's `weight_decay`, not AdamW), no LR
schedule, and global-norm gradient clipping at 1.0 applied before the
update (train.py:1104-1105).

Trainability policy (reference dinov2_backbone.py:40-51): only decoder +
LoRA(last N blocks) + projection receive updates. Frozen leaves are
stop-gradiented inside the loss so XLA prunes their backward matmuls, and
the optimizer additionally masks them (and zeroes LoRA updates for
non-adapted blocks, which the leaf-wise mask cannot express).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import DetectorConfig, OptimConfig
from ..models.detector import lora_block_multiplier, trainable_mask

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Params
    opt_state: Any
    # EMA of the trainable leaves (OptimConfig.ema_decay > 0), with
    # scalar placeholders at frozen leaves so the big frozen backbone is
    # never duplicated in HBM. None when EMA is off.
    ema: Any = None


def lr_schedule_fn(optim_cfg: OptimConfig, lr: float):
    """optax schedule for OptimConfig, or None for plain constant LR.

    Beyond-reference capability (train.py:1000-1004 has no scheduler):
    'cosine' / 'linear' decay to min_lr_ratio * lr over total_steps
    optimizer updates, each with an optional linear warmup from 0 over
    warmup_steps; 'constant' supports warmup too. total_steps == 0 is
    filled in by the training loop from the dataset size."""
    w = optim_cfg.warmup_steps
    kind = optim_cfg.lr_schedule
    if kind not in ("constant", "cosine", "linear"):
        raise ValueError(f"unknown lr_schedule {kind!r}")
    if kind == "constant" and w == 0:
        return None
    total = max(optim_cfg.total_steps, w + 1)
    end = lr * optim_cfg.min_lr_ratio
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, w, total, end_value=end
        )
    if kind == "linear":
        main = optax.linear_schedule(lr, end, max(total - w, 1))
    else:
        main = optax.constant_schedule(lr)
    if w == 0:
        return main
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, w), main], [w]
    )


def make_optimizer(
    optim_cfg: OptimConfig,
    detector_cfg: DetectorConfig,
    params: Params,
    learning_rate: float | None = None,
) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else optim_cfg.learning_rate
    mask = trainable_mask(params, detector_cfg)
    schedule = lr_schedule_fn(optim_cfg, lr)

    inner = optax.chain(
        optax.clip_by_global_norm(optim_cfg.gradient_clip_val),
        # torch-Adam L2: decay enters the gradient before moments.
        optax.add_decayed_weights(optim_cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-lr)
        if schedule is None
        else optax.scale_by_learning_rate(schedule),
    )
    tx = optax.masked(inner, mask)
    if optim_cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, optim_cfg.gradient_accumulation_steps)
    return tx


def mask_gradients(grads: Params, params: Params, detector_cfg: DetectorConfig) -> Params:
    """Zero LoRA gradients of non-adapted blocks before the optimizer, so
    they neither update nor inflate the global-norm clip (the reference's
    optimizer only ever sees requires_grad params; train.py:1000-1004)."""
    mult = lora_block_multiplier(params, detector_cfg)
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mult)


def init_ema(params: Params, detector_cfg: DetectorConfig) -> Params:
    """EMA tree: trainable leaves copied, frozen leaves replaced by a
    scalar placeholder (they never change, so EMA == live weight there
    and duplicating e.g. a ViT-g backbone would waste HBM)."""
    mask = trainable_mask(params, detector_cfg)
    # COPY trainable leaves: the train step donates the whole state, and
    # an EMA leaf aliasing its param leaf would be donated twice.
    return jax.tree_util.tree_map(
        lambda p, m: jnp.copy(p) if m else jnp.zeros((), p.dtype),
        params,
        mask,
    )


def merge_ema(params: Params, ema: Params, detector_cfg: DetectorConfig) -> Params:
    """Full param tree with trainable leaves taken from the EMA."""
    mask = trainable_mask(params, detector_cfg)
    return jax.tree_util.tree_map(
        lambda p, e, m: e if m else p, params, ema, mask
    )


def update_ema(
    ema: Params, params: Params, detector_cfg: DetectorConfig, decay: float
) -> Params:
    """One EMA step on the trainable leaves (placeholders pass through)."""
    mask = trainable_mask(params, detector_cfg)
    return jax.tree_util.tree_map(
        lambda e, p, m: (decay * e + (1.0 - decay) * p).astype(p.dtype)
        if m
        else e,
        ema,
        params,
        mask,
    )


def create_train_state(
    params: Params,
    optim_cfg: OptimConfig,
    detector_cfg: DetectorConfig,
    learning_rate: float | None = None,
) -> TrainState:
    tx = make_optimizer(optim_cfg, detector_cfg, params, learning_rate)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema=init_ema(params, detector_cfg)
        if optim_cfg.ema_decay > 0
        else None,
    )


def stop_gradient_frozen(params: Params, detector_cfg: DetectorConfig) -> Params:
    """stop_gradient every frozen leaf so XLA prunes dW computations for the
    frozen backbone (the performance analogue of requires_grad=False)."""
    mask = trainable_mask(params, detector_cfg)
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
    )
