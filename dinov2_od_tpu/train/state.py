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


def make_optimizer(
    optim_cfg: OptimConfig,
    detector_cfg: DetectorConfig,
    params: Params,
    learning_rate: float | None = None,
) -> optax.GradientTransformation:
    lr = learning_rate if learning_rate is not None else optim_cfg.learning_rate
    mask = trainable_mask(params, detector_cfg)

    inner = optax.chain(
        optax.clip_by_global_norm(optim_cfg.gradient_clip_val),
        # torch-Adam L2: decay enters the gradient before moments.
        optax.add_decayed_weights(optim_cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-lr),
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
    )


def stop_gradient_frozen(params: Params, detector_cfg: DetectorConfig) -> Params:
    """stop_gradient every frozen leaf so XLA prunes dW computations for the
    frozen backbone (the performance analogue of requires_grad=False)."""
    mask = trainable_mask(params, detector_cfg)
    return jax.tree_util.tree_map(
        lambda p, m: p if m else jax.lax.stop_gradient(p), params, mask
    )
