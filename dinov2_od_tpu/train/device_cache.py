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

Two cache layouts:

- replicated (`shard=False`): every device holds the full cache; the
  batch gather is collective-free. Capacity = one device's HBM.
- data-sharded (`shard=True`): device d holds rows
  [d*n_loc, (d+1)*n_loc) — capacity scales with the data-axis size (a
  packed COCO train2017 at 224px is 17.7 GB: over 8 chips that is
  2.2 GB/device). The per-step batch gather becomes a mask-gather +
  `psum_scatter` over the data axis (`sharded_batch_gather`): each
  device gathers the batch rows it owns, zeros the rest, and the
  reduce-scatter deposits each device's [B/D] output slice — traffic is
  one batch per step over ICI, exact (single contributor per row), and
  bit-identical to the replicated gather. Uploads go through
  `jax.make_array_from_callback`, so each process only materializes its
  addressable shards — this is also the multi-host path (every host
  holds the dataset files; no cross-host transfer).

The eval cache shards batch-dim rows ([nb, B, ...] over dim 1), which
the evaluation scan slices locally — no collectives at all.
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


def upload_train_cache(
    dataset, mesh=None, shard: bool = False, data_axis: str = "data"
) -> Dict[str, jax.Array]:
    """Upload images/boxes/labels/valid for the whole dataset, once.

    `shard=False`: replicated over `mesh` (every device holds the full
    cache) so a batch gather with any output sharding stays
    collective-free. `shard=True`: rows sharded over the mesh's data
    axis (zero-padded to a multiple of its size) — per-device HBM drops
    by the axis size and each process uploads only its addressable
    shards (multi-host safe); batches come from `sharded_batch_gather`.
    """
    arrays = _dataset_arrays(dataset, _TRAIN_KEYS)
    if not np.issubdtype(arrays["images"].dtype, np.integer):
        logger.warning(
            "device cache with float images: 4x the HBM of a uint8 feed "
            "(use --feed_dtype uint8)"
        )
    gb = sum(a.nbytes for a in arrays.values()) / 1e9
    if mesh is None:
        logger.info("uploading %.2f GB dataset cache to device", gb)
        return {k: jax.device_put(v) for k, v in arrays.items()}

    from jax.sharding import NamedSharding, PartitionSpec

    if not shard:
        logger.info("uploading %.2f GB replicated dataset cache", gb)
        sharding = NamedSharding(mesh, PartitionSpec())
        return {k: jax.device_put(v, sharding) for k, v in arrays.items()}

    d = dict(mesh.shape).get(data_axis, 1)
    n = len(next(iter(arrays.values())))
    pad = (-n) % d
    sharding = NamedSharding(mesh, PartitionSpec(data_axis))
    logger.info(
        "uploading %.2f GB dataset cache sharded %d-way over '%s' "
        "(%.2f GB/device)", gb, d, data_axis, gb / d,
    )

    def put(v: np.ndarray) -> jax.Array:
        if pad:
            v = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
        # make_array_from_callback materializes only the shards this
        # process addresses — the multi-host upload path (every host has
        # the dataset; device_put to non-addressable devices would fail).
        return jax.make_array_from_callback(
            v.shape, sharding, lambda i: v[i]
        )

    return {k: put(v) for k, v in arrays.items()}


def sharded_batch_gather(
    mesh, data_axis: str, cache: Dict[str, jax.Array], idx: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Batch gather from a row-sharded cache: leaves [n_pad, ...] sharded
    PartitionSpec(data_axis), global `idx` [B] -> leaves [B, ...] sharded
    over the data axis.

    Each device gathers all B rows against its LOCAL shard (out-of-range
    indices clamped and zero-masked), then one `psum_scatter` over the
    data axis both sums the single-contributor rows (exact — no float
    reassociation: every row has exactly one nonzero source) and deposits
    the [B/D] slice each device actually keeps. Traffic: one batch per
    call over ICI; with D=1 the scatter is the identity, so the
    single-chip path is unchanged."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    in_specs = ({k: P(data_axis) for k in cache}, P())
    out_specs = {k: P(data_axis) for k in cache}

    def block(local, idx):
        d = jax.lax.axis_index(data_axis)
        n_loc = next(iter(local.values())).shape[0]
        li = idx - d * n_loc
        ok = (li >= 0) & (li < n_loc)
        safe = jnp.where(ok, li, 0)

        def one(x):
            was_bool = x.dtype == jnp.bool_
            if was_bool:
                x = x.astype(jnp.uint8)
            v = x[safe]
            mask = ok.reshape((-1,) + (1,) * (v.ndim - 1))
            v = jnp.where(mask, v, jnp.zeros((), v.dtype))
            out = jax.lax.psum_scatter(
                v, data_axis, scatter_dimension=0, tiled=True
            )
            return out.astype(jnp.bool_) if was_bool else out

        return {k: one(v) for k, v in local.items()}

    return shard_map(
        block, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(dict(cache), idx)


def make_multi_train_step(
    cfg: TrainConfig, tx, mesh=None, batch_sharding_=None,
    sharded_cache: bool = False, data_axis: str = "data",
):
    """(state, cache, idxs [K, B], rng) -> (state, metrics stacked [K]).

    One dispatch runs K full train steps; only `idxs` crosses the link.
    K is a trace-time constant (idxs.shape[0]) — one compile per distinct
    K (the loop uses one K for full groups and at most one remainder).
    `sharded_cache` selects the row-sharded gather (sharded_batch_gather)
    for caches uploaded with shard=True."""
    inner = make_train_step(cfg, tx, mesh=mesh, jit=False)

    def multi_step(state, cache, idxs, rng):
        def body(state, idx):
            if sharded_cache:
                # Row-sharded cache: mask-gather + psum_scatter lands the
                # batch already sharded over the data axis.
                batch = sharded_batch_gather(
                    mesh, data_axis, {k: cache[k] for k in _TRAIN_KEYS}, idx
                )
            else:
                batch = {k: cache[k][idx] for k in _TRAIN_KEYS}
                if batch_sharding_ is not None:
                    # Pin the gathered batch to the data axis: the source
                    # is replicated, so each device materializes only its
                    # rows.
                    batch = {
                        k: jax.lax.with_sharding_constraint(
                            v, batch_sharding_
                        )
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
    dataset, batch_size: int, mesh=None, shard: bool = False,
    data_axis: str = "data",
) -> Tuple[Dict[str, jax.Array], np.ndarray, int]:
    """Upload images + orig sizes reshaped to [nb, B, ...] (padded with
    zero rows to a full final batch). Returns (cache, image_ids, n_real).

    `shard=True` shards the BATCH dim (dim 1) over the data axis: the
    eval scan's per-step slice is then already data-sharded, so the
    sharded layout needs no collectives at all (eval reads in order)."""
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

        spec = PartitionSpec(None, data_axis) if shard else PartitionSpec()
        sharding = NamedSharding(mesh, spec)
    cache = {}
    for k, v in arrays.items():
        if pad:
            v = np.concatenate(
                [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
            )
        v = v.reshape((nb, batch_size) + v.shape[1:])
        if sharding is not None:
            cache[k] = jax.make_array_from_callback(
                v.shape, sharding, lambda i, v=v: v[i]
            )
        else:
            cache[k] = jax.device_put(v)
    return cache, ids, n


def make_cached_eval(
    cfg: TrainConfig,
    mesh=None,
    max_detections: int = 100,
    parity_mode: bool = False,
    batch_sharding_=None,
    replicate_out: bool = False,
):
    """(params, cache) -> packed top-k [nb, B, K, 6] for the WHOLE
    dataset in one dispatch + one readback. `replicate_out` pins the
    result replicated (one in-jit all-gather) so every process can read
    it back — the multi-host path."""
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
        if replicate_out and mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            topk = jax.lax.with_sharding_constraint(
                topk, NamedSharding(mesh, PartitionSpec())
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
    return_arrays: bool = False,
):
    """evaluate_dataset semantics over an uploaded cache: identical
    result dicts (tests pin equality), one dispatch, one D2H.

    `return_arrays=True` returns the flat (image_ids, category_ids,
    boxes, scores) arrays for CocoEvaluator.evaluate_arrays instead of
    dicts — the validation hot path (dicts are then built only when
    `output_file` asks for the predictions artifact)."""
    import json

    from ..evaluation.postprocess import (
        format_detections,
        select_above_threshold,
    )

    topk = np.asarray(eval_all(params, cache))
    topk = topk.reshape(-1, *topk.shape[2:])[:n_real]
    det_args = (
        topk[..., 0], topk[..., 1].astype(np.int32), topk[..., 2:],
        image_ids[:n_real], label_to_cat_id,
    )
    kw = dict(score_threshold=score_threshold, parity_mode=parity_mode)
    if not return_arrays:
        results = format_detections(*det_args, **kw)
        if output_file and jax.process_index() == 0:
            with open(output_file, "w") as f:
                json.dump(results, f)
        return results
    arrays = select_above_threshold(*det_args, **kw)
    if output_file and jax.process_index() == 0:
        ids, cats, bx, s = arrays
        with open(output_file, "w") as f:
            json.dump(
                [
                    {"image_id": ii, "category_id": cc, "bbox": bb,
                     "score": ss}
                    for ii, cc, bb, ss in zip(
                        ids.tolist(), cats.tolist(), bx.tolist(), s.tolist()
                    )
                ],
                f,
            )
    return arrays
