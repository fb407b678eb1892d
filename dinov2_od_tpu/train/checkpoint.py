"""Orbax checkpointing with the reference's resume semantics.

Reference behavior being reproduced (dino_detector/train.py):
- periodic checkpoints carrying {epoch, model, optimizer state, loss,
  metrics_history} (train.py:1279-1288), plus a final bare-params save
  (train.py:1291-1294);
- shape-tolerant partial restore: tensors whose shapes mismatch the
  current model are skipped with a warning instead of failing
  (train.py:711-739);
- optimizer-state restore with graceful fallback when it doesn't match
  (train.py:1013-1025);
- `--skip_checkpoint_load` handled by the caller simply not calling
  restore.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger("dinov2_od_tpu")

# ---------------------------------------------------------------------------
# Async save machinery. Orbax's AsyncCheckpointer snapshots arrays to host
# memory synchronously, then serializes/writes in a background thread — the
# training loop resumes stepping while the bytes hit disk. The reference
# blocks its loop for the full torch.save (train.py:1279-1288); on a TPU
# pod a blocking multi-GB save stalls every chip in the mesh.
# ---------------------------------------------------------------------------

_ASYNC_CKPTR: Optional["ocp.AsyncCheckpointer"] = None
# metrics_history JSONs that must not be written until the async save
# finalizes (orbax writes to a tmp dir and renames it into place).
_PENDING_HISTORY: list = []


def _async_checkpointer() -> "ocp.AsyncCheckpointer":
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until every outstanding async checkpoint write has finalized
    (and flush their deferred metrics_history sidecars). Call before
    reading a just-written checkpoint and at end of training; saves and
    restores in this module call it themselves."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    while _PENDING_HISTORY:
        path, history = _PENDING_HISTORY.pop()
        with open(os.path.join(path, "metrics_history.json"), "w") as f:
            json.dump(history, f)


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def merge_compatible(template, restored, *, label: str = "params"):
    """Copy leaves from `restored` into `template` wherever path+shape
    match; everything else keeps the template value (with a warning).
    Returns (merged, num_loaded, num_skipped)."""
    restored_flat = _flatten_with_paths(restored)
    loaded = skipped = 0

    def pick(path, leaf):
        nonlocal loaded, skipped
        key = jax.tree_util.keystr(path)
        if key in restored_flat:
            cand = restored_flat[key]
            if hasattr(cand, "shape") and tuple(cand.shape) == tuple(leaf.shape):
                loaded += 1
                return jax.numpy.asarray(cand, dtype=leaf.dtype)
            logger.warning(
                "checkpoint %s: shape mismatch at %s (ckpt %s vs model %s) — skipped",
                label, key, getattr(cand, "shape", None), leaf.shape,
            )
        else:
            logger.warning("checkpoint %s: missing %s — keeping init", label, key)
        skipped += 1
        return leaf

    merged = jax.tree_util.tree_map_with_path(pick, template)
    return merged, loaded, skipped


def save_checkpoint(
    directory: str,
    epoch: int,
    params,
    opt_state,
    loss: float,
    metrics_history: Optional[Dict[str, Any]] = None,
    name: Optional[str] = None,
    async_save: bool = False,
) -> str:
    """Write one checkpoint under `directory` (reference naming:
    checkpoint_epoch_{N}; train.py:1280).

    async_save=True returns as soon as the arrays are snapshotted to host
    memory; serialization and the directory rename happen in a background
    thread (at most one save in flight — a new save waits out the
    previous). The metrics_history sidecar is deferred to finalization
    because orbax renames a tmp dir into `path`."""
    name = name or f"checkpoint_epoch_{epoch}"
    path = os.path.abspath(os.path.join(directory, name))
    payload = {
        "epoch": np.int64(epoch),
        "loss": np.float64(loss),
        "params": params,
        "opt_state": opt_state,
    }
    if async_save:
        wait_for_saves()
        _async_checkpointer().save(path, payload, force=True)
        if metrics_history is not None:
            _PENDING_HISTORY.append((path, metrics_history))
        return path
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    if metrics_history is not None:
        with open(os.path.join(path, "metrics_history.json"), "w") as f:
            json.dump(metrics_history, f)
    return path


def save_final_params(directory: str, params, name: str = "final_model") -> str:
    """Bare-params save, mirroring the reference's final state_dict-only
    format (train.py:1291-1294)."""
    path = os.path.abspath(os.path.join(directory, name))
    ocp.PyTreeCheckpointer().save(path, {"params": params}, force=True)
    return path


def restore_checkpoint(
    path: str,
    params_template,
    opt_state_template=None,
) -> Tuple[Any, Any, int, Dict[str, Any]]:
    """Shape-tolerant restore.

    Returns (params, opt_state, start_epoch, metrics_history). opt_state is
    the template (reset) if the saved optimizer state is incompatible.
    """
    wait_for_saves()  # the path may be an async save still in flight
    path = os.path.abspath(path)
    raw = ocp.PyTreeCheckpointer().restore(path)

    saved_params = raw.get("params", raw)
    params, loaded, skipped = merge_compatible(
        params_template, saved_params, label="params"
    )
    logger.info("checkpoint restore: %d tensors loaded, %d kept from init",
                loaded, skipped)

    opt_state = opt_state_template
    if opt_state_template is not None and "opt_state" in raw:
        try:
            flat_t = jax.tree_util.tree_leaves(opt_state_template)
            flat_r = jax.tree_util.tree_leaves(raw["opt_state"])
            shapes_ok = len(flat_t) == len(flat_r) and all(
                np.shape(a) == np.shape(b) for a, b in zip(flat_t, flat_r)
            )
            if shapes_ok:
                opt_state = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(opt_state_template), flat_r
                )
                logger.info("optimizer state restored")
            else:
                logger.warning(
                    "optimizer state incompatible — starting optimizer fresh "
                    "(reference fallback, train.py:1013-1025)"
                )
        except Exception as e:  # noqa: BLE001
            logger.warning("optimizer restore failed (%s) — starting fresh", e)

    epoch = int(raw.get("epoch", -1))
    start_epoch = epoch + 1 if epoch >= 0 else 0

    metrics_history: Dict[str, Any] = {}
    hist_file = os.path.join(path, "metrics_history.json")
    if os.path.exists(hist_file):
        with open(hist_file) as f:
            metrics_history = json.load(f)
    return params, opt_state, start_epoch, metrics_history


def latest_checkpoint(directory: str) -> Optional[str]:
    """Most recent checkpoint_epoch_N under a directory."""
    if not os.path.isdir(directory):
        return None
    best, best_epoch = None, -1
    for entry in os.listdir(directory):
        if entry.startswith("checkpoint_epoch_"):
            try:
                e = int(entry.rsplit("_", 1)[1])
            except ValueError:
                continue
            if e > best_epoch:
                best, best_epoch = os.path.join(directory, entry), e
    return best
