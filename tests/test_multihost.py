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


def test_host_shard_indices_multiprocess_math(monkeypatch):
    """Mocked process_count/index: shards must partition the index space
    exactly (disjoint, ordered, union == range(n)), with the remainder
    going to the last process (reference: DistributedSampler semantics,
    train.py:919)."""
    from dinov2_od_tpu.parallel import multihost

    for n_total, pc in [(103, 4), (8, 8), (7, 3), (1000, 16), (5, 8)]:
        shards = []
        for pi in range(pc):
            monkeypatch.setattr(jax, "process_count", lambda: pc)
            monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
            shards.append(multihost.host_shard_indices(n_total))
        per = n_total // pc
        for pi, s in enumerate(shards[:-1]):
            assert len(s) == per, (n_total, pc, pi)
            if len(s):
                assert s[0] == pi * per
        # Last process absorbs the remainder.
        assert len(shards[-1]) == n_total - (pc - 1) * per
        combined = np.concatenate(shards)
        np.testing.assert_array_equal(combined, np.arange(n_total))


def test_initialize_multihost_passes_args(monkeypatch):
    """Explicit coordinator args must reach jax.distributed.initialize."""
    from dinov2_od_tpu.parallel import multihost

    calls = {}

    def fake_init(coordinator_address=None, num_processes=None, process_id=None):
        calls.update(
            addr=coordinator_address, n=num_processes, pid=process_id
        )

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    multihost.initialize_multihost("10.0.0.1:1234", 4, 2)
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2}
