"""Mesh + partition-spec rules.

Parallelism layout:
- 'data' axis: batch sharding (DP). Gradient reduction happens inside jit
  — XLA inserts the all-reduce over ICI (the pjit replacement for DDP's
  NCCL hooks, reference train.py:677).
- 'model' axis: Megatron-style tensor parallelism over the wide dims of
  attention/FFN linears: column-parallel for q/k/v/fc1 (output dim
  sharded), row-parallel for proj/fc2 (input dim sharded), so each block
  needs exactly one all-reduce per attention and one per FFN, inserted
  automatically from the weight shardings.
- FSDP (MeshConfig.fsdp / --fsdp): ZeRO-3-style parameter + optimizer
  sharding over the SAME 'data' axis. Each large leaf additionally
  shards one free linear dim over 'data'; GSPMD then inserts the
  all-gather-on-use (forward and backward) and reduce-scatters the
  gradients, so per-device parameter/Adam-moment memory drops ~1/|data|
  while the math stays exactly DP. Composes with TP (a leaf sharded
  over 'model' on one dim FSDP-shards another). The optimizer state
  follows automatically: tx.init's zeros_like inherits the param
  shardings. The reference has no equivalent (its DDP replicates the
  optimizer per GPU, train.py:677).

With model_parallel_size=1 every 'model' entry collapses to replication,
so the same code path serves single-chip, pure-DP, and DP x TP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig

Params = Dict[str, Any]


def create_mesh(
    model_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    cfg: MeshConfig = MeshConfig(),
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices — or,
    when cfg.context_parallel_size > 0, a three-axis
    ('data', 'context', 'model') mesh so ring attention (tokens over
    'context') composes with Megatron TP (heads/FFN over 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    cp = cfg.context_parallel_size
    pp = cfg.pipeline_parallel_size
    if cp > 0 or pp > 0:
        mid, mid_axis = (cp, cfg.context_axis) if cp > 0 else (pp, cfg.stage_axis)
        inner = mid * model_parallel_size
        if n % inner != 0:
            raise ValueError(
                f"{n} devices not divisible by {mid_axis} size {mid}"
                f" x model_parallel_size={model_parallel_size}"
            )
        grid = np.asarray(devices).reshape(n // inner, mid, model_parallel_size)
        return Mesh(grid, (cfg.data_axis, mid_axis, cfg.model_axis))
    if n % model_parallel_size != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel_size={model_parallel_size}"
        )
    grid = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def auto_mesh(
    batch_size: int,
    model_parallel_size: int = 1,
    cfg: MeshConfig = MeshConfig(),
) -> Mesh:
    """Mesh whose data axis is the largest batch divisor that fits the
    available devices (a 4-image debug batch on an 8-device host gets a
    4-way data axis rather than a shape error)."""
    inner = (
        model_parallel_size
        * max(cfg.context_parallel_size, 1)
        * max(cfg.pipeline_parallel_size, 1)
    )
    avail = len(jax.devices()) // inner
    if avail < 1:
        raise ValueError(
            f"model_parallel_size={model_parallel_size} x "
            f"context_parallel_size={cfg.context_parallel_size} x "
            f"pipeline_parallel_size={cfg.pipeline_parallel_size} exceeds "
            f"{len(jax.devices())} devices"
        )
    dp = 1
    for d in range(min(avail, batch_size), 0, -1):
        if batch_size % d == 0:
            dp = d
            break
    devices = jax.devices()[: dp * inner]
    return create_mesh(model_parallel_size, devices=devices, cfg=cfg)


# Column-parallel linears: output dim sharded over 'model'.
_COL_PARALLEL = ("q", "k", "v", "fc1")
# Row-parallel linears: input dim sharded over 'model'. "out" is the
# decoder self/cross-attention output projection; "proj" the backbone
# attention output projection.
_ROW_PARALLEL = ("proj", "fc2", "out")
# Deformable-attention leaves (parent "deform"): the value projection is
# column-parallel (per-head value maps land shard-local when heads divide
# the model axis) and the output projection row-parallel, mirroring the
# q/k/v + out split of regular attention. Offset/weight projections have
# tiny output dims (H*P*2) and stay replicated.
_DEFORM_COL = ("value_kernel",)
_DEFORM_COL_BIAS = ("value_bias",)
_DEFORM_ROW = ("output_kernel",)


def _pspec_for(path, leaf, model_axis: str) -> P:
    keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
    # Backbone block leaves are stacked with a leading depth axis; decoder
    # layer leaves with a leading layer axis. Either way the *last* dims are
    # the linear dims, so rules are expressed from the right.
    parent = keys[-2] if len(keys) >= 2 else ""
    name = keys[-1]

    def spec_from_right(right_specs):
        pad = (None,) * (leaf.ndim - len(right_specs))
        return P(*(pad + right_specs))

    if parent == "moe":
        # Expert parallelism: expert FFN weights shard their E axis over
        # the model axis (ops/moe.py routes the dispatched activations
        # to match, so each shard runs only its local experts' GEMMs).
        # Leaf shapes (stacked under a leading depth axis):
        #   fc1_kernel [depth, E, d, m], fc2_kernel [depth, E, m, d]
        #   fc1_bias   [depth, E, m],    fc2_bias   [depth, E, d]
        #   router_kernel [depth, d, E] — replicated (it is tiny and
        #   every token needs all E logits before dispatch).
        if name in ("fc1_kernel", "fc2_kernel"):
            return spec_from_right((model_axis, None, None))
        if name in ("fc1_bias", "fc2_bias"):
            return spec_from_right((model_axis, None))
        return P()
    if parent == "deform":
        if name in _DEFORM_COL:
            return spec_from_right((None, model_axis))
        if name in _DEFORM_COL_BIAS:
            return spec_from_right((model_axis,))
        if name in _DEFORM_ROW:
            return spec_from_right((model_axis, None))
        return P()
    if parent in _COL_PARALLEL:
        if name in ("kernel", "kernel_q"):
            return spec_from_right((None, model_axis))
        if name in ("bias", "w_scale"):
            # int8 serving (models/quantize.py): w_scale is per-OUTPUT-
            # channel, so it shards with the output dim exactly like bias.
            return spec_from_right((model_axis,))
        if name == "lora_B":  # [r, out]: shard the output dim
            return spec_from_right((None, model_axis))
        return P()  # lora_A replicated (rank is tiny)
    if parent in _ROW_PARALLEL:
        if name in ("kernel", "kernel_q"):
            return spec_from_right((model_axis, None))
        if name == "lora_A":  # [in, r]: shard the input dim
            return spec_from_right((model_axis, None))
        # bias, lora_B, and int8 w_scale (per-output-channel — the output
        # dim of a row-parallel linear is unsharded) replicate. The int8
        # GEMM partitions cleanly: the per-token activation scale is a
        # max over the sharded K dim (all-reduce-max — so the QUANTIZED
        # values are shard-invariant), and partial dots reduce to within
        # ~1 ULP (tests/test_tp_sharding.py pins a lone row-parallel
        # int8_linear). Across the full network TP-vs-single outputs
        # differ at the quantization-noise scale: ULP-level fp
        # differences flip round() decisions in the dynamic per-token
        # quantization.
        return P()
    return P()


# Leaves smaller than this many elements stay replicated under FSDP:
# all-gathering a LayerNorm vector costs more in collective latency than
# its shard saves in HBM.
_FSDP_MIN_ELEMS = 65536


def _add_fsdp_axis(spec: P, leaf, data_axis: str, data_size: int) -> P:
    """Augment a (possibly TP-sharded) leaf spec with a 'data'-axis shard
    on one free linear dim (ZeRO-3). Only the last two dims are
    candidates — they are the linear in/out dims; leading dims are the
    lax.scan block-stack axes, and sharding a scan operand's leading axis
    would put every step's slice on a single shard. Largest eligible
    (unsharded, divisible) dim wins; leaves with no eligible dim stay as
    they are (graceful: an indivisible dim is a skip, not an error)."""
    if data_size <= 1 or leaf.ndim == 0:
        return spec
    import math

    if math.prod(leaf.shape) < _FSDP_MIN_ELEMS:
        return spec
    entries = list(spec) + [None] * (leaf.ndim - len(spec))
    candidates = sorted(
        (
            dim
            for dim in range(max(0, leaf.ndim - 2), leaf.ndim)
            if entries[dim] is None and leaf.shape[dim] % data_size == 0
            and leaf.shape[dim] > 0
        ),
        key=lambda dim: leaf.shape[dim],
        reverse=True,
    )
    if not candidates:
        return spec
    entries[candidates[0]] = data_axis
    return P(*entries)


def check_tp_compatible(detector_cfg, model_parallel_size: int) -> None:
    """Head counts and sharded dims must divide the model axis, or the
    Megatron col/row split silently degrades to cross-shard gathers."""
    if model_parallel_size <= 1:
        return
    tp = model_parallel_size
    bb, dec = detector_cfg.backbone, detector_cfg.decoder
    for what, heads in (("backbone", bb.num_heads), ("decoder", dec.num_heads)):
        if heads % tp != 0:
            raise ValueError(
                f"{what} num_heads={heads} not divisible by "
                f"model_parallel_size={tp}"
            )
    for what, dim in (
        ("backbone hidden_dim", bb.hidden_dim),
        ("backbone mlp_dim", bb.mlp_dim),
        ("decoder hidden_dim", dec.hidden_dim),
        ("decoder dim_feedforward", dec.dim_feedforward),
    ):
        if dim % tp != 0:
            raise ValueError(
                f"{what}={dim} not divisible by model_parallel_size={tp}"
            )
    if bb.ffn_type == "moe" and bb.moe_num_experts % tp != 0:
        raise ValueError(
            f"backbone moe_num_experts={bb.moe_num_experts} not divisible "
            f"by model_parallel_size={tp} (experts shard over the model "
            f"axis)"
        )


def param_shardings(
    params: Params, mesh: Mesh, cfg: MeshConfig = MeshConfig()
) -> Params:
    """NamedSharding pytree for a detector param tree."""
    if cfg.fsdp and (
        cfg.context_parallel
        or cfg.pipeline_parallel
        or cfg.context_parallel_size > 0
        or cfg.pipeline_parallel_size > 0
    ):
        # The pipeline's manual shard_map re-slices the (replicated)
        # block stack per stage, and the ring path replicates params over
        # 'context' — a data-sharded leaf would arrive as a local shard
        # inside those manual regions and silently compute garbage.
        raise ValueError(
            "fsdp does not compose with pipeline/context parallelism; "
            "use FSDP with plain DP or DP x TP"
        )
    if cfg.context_parallel or cfg.pipeline_parallel:
        # The model axis carries tokens (ring attention) or pipeline
        # stages, not tensor shards: parameters replicate over it (the
        # pipeline's shard_map re-slices the block stack per stage).
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(mesh, P()), params
        )
    data_size = mesh.shape.get(cfg.data_axis, 1) if cfg.fsdp else 1

    def leaf_sharding(path, leaf):
        spec = _pspec_for(path, leaf, cfg.model_axis)
        if cfg.fsdp:
            spec = _add_fsdp_axis(spec, leaf, cfg.data_axis, data_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Batch arrays shard their leading dim over 'data'."""
    return NamedSharding(mesh, P(cfg.data_axis))


def shard_params(params: Params, mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> Params:
    """Place a (host-resident) param tree onto the mesh."""
    shardings = param_shardings(params, mesh, cfg)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
