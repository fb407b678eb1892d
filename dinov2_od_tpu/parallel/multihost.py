"""Multi-host SPMD: initialization and per-host data feeding.

The reference is single-node only (MASTER_ADDR hardcoded to localhost,
train.py:499; SURVEY.md §3.4). The TPU-native scale-out path is JAX
multi-controller SPMD: one process per host, `jax.distributed.initialize`
for the coordination service, a global mesh spanning all hosts' devices,
and `make_array_from_process_local_data` to assemble globally-sharded
batches from per-host loader shards. ICI carries intra-slice collectives;
DCN carries inter-slice.

Single-host calls are no-ops, so the training loop is identical either
way.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger("dinov2_od_tpu")


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: bool = False,
) -> None:
    """Join the multi-host job. With explicit arguments, passes them to
    jax.distributed.initialize. With auto=True and no arguments (the CLI's
    bare --multihost), initializes with pod environment auto-discovery.
    Without auto, the no-argument call stays a single-process no-op."""
    if num_processes in (None, 0, 1) and coordinator_address is None:
        if auto:
            jax.distributed.initialize()
        else:
            try:
                if jax.process_count() > 1:
                    return  # already initialized by the runtime
            except Exception:  # noqa: BLE001
                pass
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def host_shard_indices(n_total: int) -> np.ndarray:
    """This host's contiguous shard of the dataset index space (the
    DistributedSampler equivalent; reference train.py:919)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n_total // pc
    start = pi * per
    end = start + per if pi < pc - 1 else n_total
    return np.arange(start, end)


def global_batch_from_local(
    local_batch: Dict[str, np.ndarray], sharding
) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from this process's local shard
    (each host loads 1/process_count of the global batch)."""
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in local_batch.items()
    }
