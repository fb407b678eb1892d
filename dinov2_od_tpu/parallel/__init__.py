"""Device-mesh parallelism: mesh construction, parameter/batch partition
specs (DP + Megatron-style TP), and sharding helpers.

Replaces the reference's single-node DDP machinery — mp.spawn process per
GPU, NCCL process group, DistributedSampler, explicit all_reduce
(dino_detector/train.py:491-512, :1501-1506; losses.py:228-230) — with
single-process JAX SPMD: a Mesh('data', 'model'), NamedSharding
annotations, and XLA-inserted collectives over ICI.
"""

from .sharding import (  # noqa: F401
    auto_mesh,
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_params,
)
