"""Device-resident dataset cache + multi-step dispatch.

The endgame of the input pipeline (BENCH.md "host input pipeline"
ledger): after packing (data/packed.py) removed JPEG decode from the
loop, the remaining from-disk gap to the device-only rate is pure
host<->device traffic — per-batch H2D image transfer and one dispatch
round trip per step. Both scale with link latency/bandwidth, not with
model FLOPs, so on narrow links (this relay: ~40 ms/dispatch,
~130 MB/s H2D) they dominate the step.

This module removes both:

- `upload_train_cache` puts the ENTIRE dataset (uint8 images + padded
  targets) into device HBM once — COCO-scale check: 10k images at 224px
  is 1.5 GB, v5e has 16 GB. The per-step batch is then a device-side
  gather `cache[k][idx]`; the only remaining H2D is the shuffled index
  array (K*B int32 per dispatch).
- `make_multi_train_step` lax.scan's K train steps per dispatch, so the
  per-dispatch round trip amortizes K-fold. The scanned body is the
  exact single-step train_step (train/step.py, jit=False) — same rng
  schedule (fold_in(state.step)), same optimizer/EMA/augmentation
  semantics, bit-identical trajectory to K sequential dispatches
  (tests/test_device_cache.py pins this).

The reference has no equivalent: its torch DataLoader re-decodes and
re-uploads every image every epoch (dino_detector/dataset.py:55,
train.py:584-587). Eval gets the same treatment: `make_cached_eval`
scans the fused top-k eval step over the whole cached dataset in ONE
dispatch and reads back a single packed [nb, B, K, 6] array.

Single-host only (any local mesh: DP/TP/...): the cache is replicated
over the mesh, and a 'data'-sharded gather from a replicated source
needs no collectives. Multi-host pods keep the per-host loader path.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from .step import make_eval_topk_step, make_train_step

logger = logging.getLogger("dinov2_od_tpu")

_TRAIN_KEYS = ("images", "boxes", "labels", "valid")


def _dataset_arrays(dataset, keys) -> Dict[str, np.ndarray]:
    n = len(dataset)
    if hasattr(dataset, "get_batch"):
        return {k: v for k, v in dataset.get_batch(np.arange(n)).items()
                if k in keys}
    ex = [dataset.get_example(i) for i in range(n)]
    return {k: np.stack([e[k] for e in ex]) for k in keys}


def cache_nbytes(dataset, keys=_TRAIN_KEYS) -> int:
    """Estimated HBM footprint of the cache (without uploading)."""
    ex = dataset.get_example(0)
    return len(dataset) * sum(ex[k].nbytes for k in keys if k in ex)


def upload_train_cache(dataset, mesh=None) -> Dict[str, jax.Array]:
    """Upload images/boxes/labels/valid for the whole dataset, once.

    Replicated over `mesh` (every device holds the full cache) so a
    batch gather with any output sharding stays collective-free."""
    arrays = _dataset_arrays(dataset, _TRAIN_KEYS)
    if not np.issubdtype(arrays["images"].dtype, np.integer):
        logger.warning(
            "device cache with float images: 4x the HBM of a uint8 feed "
            "(use --feed_dtype uint8)"
        )
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
    gb = sum(a.nbytes for a in arrays.values()) / 1e9
    logger.info("uploading %.2f GB dataset cache to device", gb)
    return {k: jax.device_put(v, sharding) for k, v in arrays.items()}


def make_multi_train_step(
    cfg: TrainConfig, tx, mesh=None, batch_sharding_=None
):
    """(state, cache, idxs [K, B], rng) -> (state, metrics stacked [K]).

    One dispatch runs K full train steps; only `idxs` crosses the link.
    K is a trace-time constant (idxs.shape[0]) — one compile per distinct
    K (the loop uses one K for full groups and at most one remainder)."""
    inner = make_train_step(cfg, tx, mesh=mesh, jit=False)

    def multi_step(state, cache, idxs, rng):
        def body(state, idx):
            batch = {k: cache[k][idx] for k in _TRAIN_KEYS}
            if batch_sharding_ is not None:
                # Pin the gathered batch to the data axis: the source is
                # replicated, so each device materializes only its rows.
                batch = {
                    k: jax.lax.with_sharding_constraint(v, batch_sharding_)
                    for k, v in batch.items()
                }
            state, metrics = inner(state, batch, rng)
            return state, metrics

        return jax.lax.scan(body, state, idxs)

    return jax.jit(multi_step, donate_argnums=(0,))


def epoch_index_groups(
    n: int,
    batch_size: int,
    steps_per_dispatch: int,
    seed: int,
    epoch: int,
    skip: int = 0,
) -> List[np.ndarray]:
    """The epoch's dispatch schedule: the SAME shuffled order the
    DataLoader would produce (data/loader.py shuffled_order, drop_last),
    chunked into [K, B] groups plus at most one [K', B] remainder.
    `skip` drops the first N batches (exact mid-epoch resume)."""
    from ..data.loader import shuffled_order

    order = shuffled_order(n, seed, epoch)
    nb = n // batch_size
    batches = order[: nb * batch_size].reshape(nb, batch_size)[skip:]
    k = max(1, steps_per_dispatch)
    return [batches[i : i + k] for i in range(0, len(batches), k)]


# ---------------------------------------------------------------------------
# Cached evaluation
# ---------------------------------------------------------------------------

def upload_eval_cache(
    dataset, batch_size: int, mesh=None
) -> Tuple[Dict[str, jax.Array], np.ndarray, int]:
    """Upload images + orig sizes reshaped to [nb, B, ...] (padded with
    zero rows to a full final batch). Returns (cache, image_ids, n_real).
    """
    keys = ("images", "orig_size")
    arrays = _dataset_arrays(dataset, keys)
    if hasattr(dataset, "get_batch"):
        ids = dataset.get_batch(np.arange(len(dataset)))["image_id"]
    else:
        ids = np.asarray(
            [dataset.get_example(i)["image_id"] for i in range(len(dataset))]
        )
    n = len(ids)
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
    cache = {}
    for k, v in arrays.items():
        if pad:
            v = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
            )
        cache[k] = jax.device_put(
            v.reshape((nb, batch_size) + v.shape[1:]), sharding
        )
    return cache, ids, n


def make_cached_eval(
    cfg: TrainConfig,
    mesh=None,
    max_detections: int = 100,
    parity_mode: bool = False,
    batch_sharding_=None,
):
    """(params, cache) -> packed top-k [nb, B, K, 6] for the WHOLE
    dataset in one dispatch + one readback."""
    step = make_eval_topk_step(
        cfg, mesh=mesh, max_detections=max_detections,
        parity_mode=parity_mode, jit=False,
    )

    def eval_all(params, cache):
        def body(_, xs):
            images, orig = xs
            if batch_sharding_ is not None:
                images = jax.lax.with_sharding_constraint(
                    images, batch_sharding_
                )
            return None, step(params, images, orig)["topk"]

        _, topk = jax.lax.scan(
            body, None, (cache["images"], cache["orig_size"])
        )
        return topk

    return jax.jit(eval_all)


def evaluate_cached(
    eval_all,
    params,
    cache: Dict[str, jax.Array],
    image_ids: np.ndarray,
    n_real: int,
    label_to_cat_id: Dict[int, int],
    output_file: Optional[str] = None,
    score_threshold: float = 0.05,
    parity_mode: bool = False,
) -> List[dict]:
    """evaluate_dataset semantics over an uploaded cache: identical
    result dicts (tests pin equality), one dispatch, one D2H."""
    import json

    from ..evaluation.postprocess import format_detections

    topk = np.asarray(eval_all(params, cache))
    topk = topk.reshape(-1, *topk.shape[2:])[:n_real]
    results = format_detections(
        topk[..., 0], topk[..., 1].astype(np.int32), topk[..., 2:],
        image_ids[:n_real], label_to_cat_id,
        score_threshold=score_threshold, parity_mode=parity_mode,
    )
    if output_file and jax.process_index() == 0:
        with open(output_file, "w") as f:
            json.dump(results, f)
    return results
