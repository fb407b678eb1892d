"""Fused dynamic-quantize + int8 GEMM Pallas kernel (serving path).

The W8A8 serving path (models/quantize.py) costs, per linear, a separate
activation-quantization pass (absmax reduce + round/clip/convert over
the whole [B, S, K] input) before XLA's s8 dot — measured 0.03-0.06 ms
per GEMM at ViT-B b32, ~1.5 ms/step total (trace: convert_reduce
fusions). This kernel folds that pass into the GEMM's prologue: each
M-tile of x is quantized ONCE into VMEM scratch on the first N-block
grid step (TPU grid steps run sequentially, so scratch persists across
the innermost dim), and the quantize VPU work overlaps the MXU dots
instead of serializing in front of them. The intermediate x_q never
touches HBM.

Math is identical to models/quantize.py::int8_linear (same per-token
symmetric scheme, same eps clamp), so the kernel is a drop-in inside it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only scratch shapes; CPU tests run interpret mode.
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_EPS = 1e-8
_QMAX = 127.0
_SUBLANE = 8  # fp32/int32 sublane; bf16 x is padded by the wrapper


def _kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, xq_ref, xs_ref):
    ni = pl.program_id(1)

    @pl.when(ni == 0)
    def _quantize_tile():
        x = x_ref[...].astype(jnp.float32)
        s = jnp.maximum(
            jnp.max(jnp.abs(x), axis=1, keepdims=True) / _QMAX, _EPS
        )
        xs_ref[...] = s
        xq_ref[...] = jnp.clip(jnp.round(x / s), -_QMAX, _QMAX).astype(
            jnp.int8
        )

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (xs_ref[...] * ws_ref[...]) + b_ref[...]
    o_ref[...] = out.astype(o_ref.dtype)


def _pick_block(dim: int, target: int, multiple: int) -> int:
    """Largest divisor of `dim` that is <= target and a multiple of
    `multiple`; 0 if none exists."""
    best = 0
    for b in range(multiple, min(dim, target) + 1, multiple):
        if dim % b == 0:
            best = b
    return best


# Trace-time switch: the fused pallas_call is opaque to the SPMD
# partitioner, so under tensor parallelism it would force an all-gather
# of the K-sharded fc2 weight/activation on every call. make_eval_step /
# the CLI flip this off before tracing a TP program; the unfused s8 dot
# partitions exactly (see parallel/sharding.py row-parallel notes).
_FUSED_ENABLED = True


def set_fused_enabled(enabled: bool) -> None:
    global _FUSED_ENABLED
    _FUSED_ENABLED = bool(enabled)


def int8_gemm_eligible(m: int, k: int, n: int) -> bool:
    """Shapes the fused kernel handles: lane-aligned K/N with a valid
    N block, and a whole-K slab that fits VMEM at some M block."""
    if not _FUSED_ENABLED:
        return False
    if k % 128 or n % 128:
        return False
    if _pick_block(n, 1024, 128) == 0:
        return False
    return k <= 4096  # [bm, K] bf16 + int8 scratch slabs must fit VMEM


@functools.partial(jax.jit, static_argnames=("interpret",))
def _run(x2d, w_q, w_scale, bias, interpret=False):
    m, k = x2d.shape
    n = w_q.shape[1]
    if pltpu is None:
        # No TPU pallas available (pure-CPU install): unfused math,
        # identical numerics.
        xs = jnp.maximum(
            jnp.max(jnp.abs(x2d.astype(jnp.float32)), -1, keepdims=True)
            / _QMAX,
            _EPS,
        )
        xq = jnp.clip(
            jnp.round(x2d.astype(jnp.float32) / xs), -_QMAX, _QMAX
        ).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * (xs * w_scale) + bias).astype(
            x2d.dtype
        )
    # K in VMEM three times over ([bm, K] bf16 x, int8 x_q, plus the
    # [K, bn] weight slab): size bm (and at giant widths bn) down as K
    # grows. Budget check at the worst case (K=4096, giant swiglu fc2:
    # bf16[4352,4096] x s8[4096,1536]): double-buffered blocks
    # 2*(256*4096*2 + 4096*512 + 256*512*2) + scratch 256*4096 = ~10M
    # of the 16M scoped vmem — the former (512, 1024) blocks hit 17.8M
    # and failed to compile (round 5).
    if k <= 1024:
        bm_t, bn_t = 1024, 1024
    elif k <= 2048:
        bm_t, bn_t = 512, 1024
    else:
        bm_t, bn_t = 256, 512
    bm = _pick_block(m, bm_t, _SUBLANE)
    bn = _pick_block(n, bn_t, 128)
    return pl.pallas_call(
        _kernel,
        grid=(m // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda mi, ni: (mi, 0)),
            pl.BlockSpec((k, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
            pl.BlockSpec((1, bn), lambda mi, ni: (0, ni)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni: (mi, ni)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2d.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, w_q, w_scale.reshape(1, n), bias.reshape(1, n))


def fused_int8_linear(x: jnp.ndarray, p, interpret: bool = False):
    """y = dequant(quant(x) @ kernel_q) + bias via the fused kernel.

    x: [..., K]; p: {"kernel_q": int8 [K, N], "w_scale": [N], "bias": [N]}.
    Numerics identical to the unfused int8_linear path.
    """
    k = x.shape[-1]
    n = p["kernel_q"].shape[1]
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2d = x.reshape(m, k)
    m_pad = ((m + _SUBLANE - 1) // _SUBLANE) * _SUBLANE
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    out = _run(
        x2d,
        p["kernel_q"],
        p["w_scale"].astype(jnp.float32),
        p["bias"].astype(jnp.float32),
        interpret=interpret,
    )
    return out[:m].reshape(*lead, n)
