"""Multi-host helpers, exercised in their single-process form (process
count 1): shard indices cover the dataset exactly, and global batch
assembly produces correctly-sharded arrays on the local mesh."""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from dinov2_od_tpu.parallel import create_mesh
from dinov2_od_tpu.parallel.multihost import (
    global_batch_from_local,
    host_shard_indices,
    initialize_multihost,
)


def test_initialize_single_process_is_noop():
    initialize_multihost()  # must not raise or spawn anything
    assert jax.process_count() == 1


def test_host_shard_indices_cover_dataset():
    idx = host_shard_indices(103)
    np.testing.assert_array_equal(idx, np.arange(103))


def test_global_batch_from_local_sharding():
    mesh = create_mesh(model_parallel_size=1)
    sharding = NamedSharding(mesh, P("data"))
    local = {
        "images": np.random.default_rng(0).normal(size=(8, 4, 4, 3)).astype(np.float32),
        "labels": np.arange(8, dtype=np.int32),
    }
    out = global_batch_from_local(local, sharding)
    assert out["images"].shape == (8, 4, 4, 3)
    assert out["images"].sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(out["labels"]), local["labels"])
