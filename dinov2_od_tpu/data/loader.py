"""Threaded, prefetching batch loader.

Replaces torch DataLoader + DistributedSampler (reference train.py:919-995)
with a dependency-free loader tuned for the TPU feed pattern:

- worker threads decode/resize images in parallel (PIL releases the GIL);
- batches are assembled into contiguous numpy arrays (static shapes — the
  padding already happened per-example);
- a bounded prefetch queue keeps the accelerator fed while the host
  decodes the next batches;
- seeded, epoch-aware shuffling (`set_epoch` semantics of
  DistributedSampler, train.py:1039) so runs are reproducible.

Multi-host: every process computes the SAME global batch sequence (the
shuffle is seeded identically), and each decodes only its interleaved
slice `idxs[process_id::process_count]` of every global batch — the
per-host half of jax.make_array_from_process_local_data (see
parallel/multihost.py). Because batch composition is decided globally,
an N-process run consumes exactly the batches a 1-process run would
(tested by equality in tests/test_multihost.py). Within a host, the
batch is sharded across local devices by the step's 'data' axis
sharding.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np


def shuffled_order(
    n: int, seed: int, epoch: int, shuffle: bool = True
) -> np.ndarray:
    """The canonical epoch example order: seeded, epoch-aware
    (DistributedSampler.set_epoch semantics, reference train.py:1039).
    Shared by DataLoader and the device-cached loop (train/device_cache.py)
    so both consume identical batch sequences."""
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    return order


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        process_count: int = 1,
        process_id: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0
        if process_count > 1 and batch_size % process_count:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes"
            )
        self.process_count = process_count
        self.process_id = process_id

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        return shuffled_order(
            len(self.dataset), self.seed, self.epoch, self.shuffle
        )

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._order()
        n = len(order)
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        local_real: list = []
        if self.process_count > 1:
            # This host materializes only its interleaved slice of each
            # global batch; global row order is concat-by-process, which
            # is exactly how make_array_from_process_local_data lays host
            # shards into the global array. A trailing partial batch is
            # padded to the full global size by repeating its first index
            # (every host MUST step in SPMD), and each batch carries
            # `_local_n` = this host's count of real (non-padding) rows —
            # real rows form a prefix of the local slice because global
            # row g maps to local row (g - pid) / pcount monotonically.
            pid, pc = self.process_id, self.process_count
            padded = []
            for b in batches:
                n = len(b)
                if n < self.batch_size:
                    b = np.concatenate(
                        [b, np.full(self.batch_size - n, b[0], b.dtype)]
                    )
                padded.append(b[pid::pc])
                local_real.append(max(0, -(-(n - pid) // pc)) if n > pid else 0)
            batches = padded

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # Packed datasets (data/packed.py) assemble a whole batch with one
        # gather per field; decoding datasets fan out per example.
        fast_batch = getattr(self.dataset, "get_batch", None)

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for bi, idxs in enumerate(batches):
                    if stop.is_set():
                        break
                    if fast_batch is not None:
                        batch = fast_batch(idxs)
                    else:
                        examples = list(
                            pool.map(self.dataset.get_example, idxs)
                        )
                        batch = {
                            k: np.stack([e[k] for e in examples])
                            for k in examples[0]
                        }
                    if local_real:
                        batch["_local_n"] = np.int64(local_real[bi])
                    q.put(batch)
            q.put(None)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit.
            while producer.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    producer.join(timeout=0.1)


def device_prefetch(
    iterator,
    sharding=None,
    size: int = 2,
    device_keys=None,
    transform=None,
):
    """Overlap host->device transfer with device compute.

    A background thread pulls batches from `iterator`, applies
    `transform` (e.g. pad_batch), and enqueues them with `device_keys`
    already transferred (jax.device_put with `sharding`), up to `size`
    batches ahead. While the device runs step i, batch i+1's decode AND
    transfer proceed concurrently — without this, each step serializes
    transfer -> compute (on a ~30ms-RTT relay the transfer alone is a
    step-scale cost). device_keys=None transfers every key; keys not
    listed stay host numpy (image_id/orig_size metadata).

    Multi-host: when more than one JAX process is attached, device keys
    are assembled into globally-sharded arrays with
    jax.make_array_from_process_local_data — each process supplies its
    local rows (the loader's per-host slice) and the result spans the
    whole mesh. Single-process keeps plain device_put.

    Yields dicts mixing device arrays (device_keys) and host arrays.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    stop = threading.Event()
    multiprocess = jax.process_count() > 1 and sharding is not None

    def put_on_device(batch):
        out = {}
        for k, v in batch.items():
            if device_keys is None or k in device_keys:
                if multiprocess:
                    out[k] = jax.make_array_from_process_local_data(sharding, v)
                else:
                    out[k] = jax.device_put(v, sharding)
            else:
                out[k] = v
        return out

    def produce():
        try:
            for batch in iterator:
                if stop.is_set():
                    break
                if transform is not None:
                    batch = transform(batch)
                q.put(("batch", put_on_device(batch)))
        except Exception as e:  # noqa: BLE001 — surface in the consumer
            q.put(("error", e))
            return
        q.put(("end", None))

    producer = threading.Thread(target=produce, daemon=True)
    producer.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "end":
                break
            if kind == "error":
                raise payload
            yield payload
    finally:
        stop.set()
        while producer.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                producer.join(timeout=0.1)


def pad_batch(batch: Dict[str, np.ndarray], batch_size: int) -> Dict[str, np.ndarray]:
    """Pad a trailing partial batch to the full static batch size (padded
    examples have valid=False everywhere so they contribute nothing to the
    loss; for eval, callers slice by the returned original count)."""
    n = len(next(iter(batch.values())))
    if n == batch_size:
        return batch
    out = {}
    for k, v in batch.items():
        pad_shape = (batch_size - n,) + v.shape[1:]
        out[k] = np.concatenate([v, np.zeros(pad_shape, v.dtype)])
    return out
