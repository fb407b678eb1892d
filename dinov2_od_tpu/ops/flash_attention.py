"""Fused multi-head attention Pallas kernel for TPU, with custom VJP.

Replaces the cuDNN attention inside the reference's HF DINOv2 backbone
(dino_detector/models/dinov2_backbone.py:60) with a TPU-native kernel:

- Forward: per (batch, head, q-block) grid step, the whole K/V for that
  head is staged in VMEM (ViT sequences are <= ~1370 tokens at 518px, so
  K+V fit comfortably) and softmax(QK^T)V is computed with fp32
  accumulation on the MXU. Attention probabilities never touch HBM —
  the same memory property as streaming flash attention, without the
  online-softmax bookkeeping that longer sequences would need.
- Backward: ONE fused kernel over k-blocks using the saved logsumexp,
  recomputing probabilities on the fly; dq is accumulated in fp32 across
  the sequential k-block grid dim (a revisited output), so the softmax
  recompute happens once, not once per backward output.
- Ragged sequence lengths are handled by padding to the lane multiple and
  statically masking padded keys.

All matmuls specify preferred_element_type=float32 so bf16 inputs still
accumulate in fp32 (pallas_guide.md: MXU precision rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only module; import lazily so CPU tests can still interpret.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_NEG_INF = -1e30
_LANE = 128
_SUBLANE = 16  # covers fp32 (8) and bf16 (16) sublane tiling

# The softmax is computed in base 2: q is pre-scaled by scale*log2(e)
# inside the kernel (a [bq, dh] multiply) so the [bq, S] logits tile never
# needs the full-size `* scale` VPU pass, and exp2 replaces exp (XLA
# lowers exp(x) to exp2(x * log2e) — another full-tile multiply saved).
# The saved lse is therefore in LOG2 space (m + log2(l)); the backward
# kernels recompute p = exp2(s2 - lse2) with the same folded scale. At
# 518px (1370 tokens) the kernel is VPU(softmax)-bound at ~37% MXU, so
# shaving full-tile VPU passes is the lever (BENCH.md).
_LOG2E = 1.4426950408889634


def _mask_lane(n: int, valid: int, offset, dtype):
    """[n, 1] additive mask column: 0 for rows with global id < valid,
    _NEG_INF otherwise. Appended to k (or q) as an extra contraction lane
    so the QK^T matmul emits PRE-masked logits — the full-tile
    iota/compare/select VPU pass this replaces was ~1 of the ~3 VPU
    traversals in the VPU-bound forward (BENCH.md). bf16 carries -1e30
    exactly enough (same exponent range as fp32); dh 64 -> 66 lanes stays
    inside one 128-lane MXU tile, so the fold is free."""
    ids = offset + jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    return jnp.where(ids < valid, 0.0, _NEG_INF).astype(dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# VMEM budget for the fp32 logits tile; the rest of the working set (q/k/v
# blocks, output) stays well under the remaining ~8MB.
_LOGITS_VMEM_BUDGET = 8 * 2**20


def _auto_block(s: int, other_pad: int, n_buffers: int = 2) -> int:
    """Block size over `s` whose n_buffers x [block, other_pad] fp32
    working set fits the VMEM budget — single-block when possible
    (grid-launch overhead dominates at ViT sequence lengths; measured on
    v5e: whole-seq blocks are ~25% faster than 256-blocks at 1370 tokens).
    The forward keeps ~2 logits-sized buffers live, the backward ~4.

    When `s` exceeds the VMEM cap, the dim is split into the FEWEST
    equal blocks rather than blocks of exactly the cap: rounding s up to
    a near-s cap multiple nearly doubles the padded length (e.g. 1376
    tokens with cap 1232 -> round_up = 2464, a 79% compute tax on every
    q row — observed on the ViT-L/518 trace); two 688-blocks pad to
    1376 exactly."""
    # 16MB scoped VMEM minus ~3MB for q/k/v/do slices and outputs.
    budget = 13 * 2**20
    cap = budget // (4 * other_pad * n_buffers)
    cap = max(_SUBLANE, (cap // _SUBLANE) * _SUBLANE)
    s_pad = _round_up(s, _SUBLANE)
    if s_pad <= cap:
        return s_pad
    n_blocks = -(-s_pad // cap)
    return _round_up(-(-s_pad // n_blocks), _SUBLANE)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    q = q_ref[0, 0] * (scale * _LOG2E)  # [bq, dh]; scale folded into q
    k = k_ref[0, 0]  # [S, dh]
    v = v_ref[0, 0]  # [S, dh]

    s_pad = k.shape[0]
    if kv_len < s_pad:
        # Key masking folded into the MXU: one extra contraction lane
        # (q gains a ones lane, k a 0/-1e30 lane) instead of a full-tile
        # VPU select on the [bq, S] logits (see _mask_lane).
        q = jnp.concatenate([q, jnp.ones((q.shape[0], 1), q.dtype)], axis=-1)
        k = jnp.concatenate([k, _mask_lane(s_pad, kv_len, 0, k.dtype)], axis=-1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, S], log2-space logits, padded keys pre-masked to ~-1e30

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    # Softmax row-sum on the MXU: augment v with a ones column so l falls
    # out of the PV matmul's last lane. Removes a full [bq, S] VPU reduce
    # pass per tile (the kernel is VPU-bound at large S: exp2 measures
    # ~1 VPU pass, so every traversal saved counts). The v concat is a
    # [S, dh] pass — ~30x smaller than the logits tile. dh 64 -> 65 lanes
    # stays inside the MXU's 128-lane tile, so the dot costs the same.
    v_aug = jnp.concatenate(
        [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1
    )
    o_aug = jax.lax.dot_general(
        p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, dh + 1]; last lane = sum_k p
    dh = v.shape[1]
    l = o_aug[:, dh:]
    o = o_aug[:, :dh] / l
    o_ref[0, 0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log2(l)  # [bq, 1], log2 space


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dq_ref, *, scale, q_len, kv_len, block_k,
                mask_keys):
    """Fused backward over k-blocks: dk/dv for this block, PLUS this
    block's contribution to dq, accumulated into a revisited fp32 output
    across the (sequential) k-block grid dim. Before the fusion a
    separate dq kernel re-did the QK^T matmul, the key masking, the
    p = exp2(s - lse) pass and the dp matmul per q-block — at 518
    (S=1370) that duplicate softmax recompute was ~half the backward's
    VPU work (BENCH.md: backward is the dominant attention cost there)."""
    q = q_ref[0, 0]      # [S_q, dh] (whole padded q)
    k = k_ref[0, 0]      # [bk, dh]
    v = v_ref[0, 0]
    do = do_ref[0, 0]    # [S_q, dh]
    lse = lse_ref[0, 0]      # [S_q, 1], log2 space
    delta = delta_ref[0, 0]  # [S_q, 1]

    s_pad = q.shape[0]
    bk = k.shape[0]
    # Both masks folded into extra MXU contraction lanes (see _mask_lane):
    # - padded q rows (zero rows with lse=0 -> p=1 unmasked) get a
    #   0/-1e30 q lane dotted with a ones k lane;
    # - keys at global positions >= kv_len (padding whose dk/dv rows must
    #   be exactly zero — the caller's padded key rows can carry nonzero
    #   activations under whole-network sequence padding) get a ones q
    #   lane dotted with a per-block 0/-1e30 k lane.
    q_lanes = [q * (scale * _LOG2E)]
    k_lanes = [k]
    if q_len < s_pad:
        q_lanes.append(_mask_lane(s_pad, q_len, 0, q.dtype))
        k_lanes.append(jnp.ones((bk, 1), k.dtype))
    if mask_keys:
        q_lanes.append(jnp.ones((s_pad, 1), q.dtype))
        k_lanes.append(
            _mask_lane(bk, kv_len, pl.program_id(2) * block_k, k.dtype)
        )
    qa = q_lanes[0] if len(q_lanes) == 1 else jnp.concatenate(q_lanes, -1)
    ka = k_lanes[0] if len(k_lanes) == 1 else jnp.concatenate(k_lanes, -1)
    s = jax.lax.dot_general(
        qa, ka, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_q, bk], pre-masked
    p = jnp.exp2(s - lse)  # [S_q, bk]

    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, dh]
    dp = jax.lax.dot_general(
        do * scale, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_q, bk]; scale folded into the do tile
    ds = p * (dp - delta * scale)
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bk, dh]; dk uses the ORIGINAL (unscaled) q
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    # dq accumulation: masked p rows (padded q) are zero, so ds rows are
    # zero and the padded dq rows stay exactly zero.
    dq_contrib = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [S_q, dh]
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_ref[0, 0] = dq_contrib

    @pl.when(ki > 0)
    def _acc():
        dq_ref[0, 0] += dq_contrib


def _pad_seq(x, s_pad):
    s = x.shape[2]
    if s == s_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))




# ---------------------------------------------------------------------------
# All-heads variant: grid over batch only. At ViT lengths (e.g. 257 tokens)
# the per-(batch, head) grid is launch-bound — folding every head into one
# grid step as head-batched MXU matmuls cuts launches by num_heads.
# Selected when the whole [H, S, S] fp32 logits tile fits the VMEM budget.
# ---------------------------------------------------------------------------

def _fwd_kernel_allheads(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    q = q_ref[0] * (scale * _LOG2E)  # [H, Sq, dh]; scale folded into q
    k = k_ref[0]
    v = v_ref[0]
    if kv_len < k.shape[1]:
        # MXU-folded key mask (see _mask_lane), broadcast over heads.
        g, sk = k.shape[0], k.shape[1]
        q = jnp.concatenate(
            [q, jnp.ones((g, q.shape[1], 1), q.dtype)], axis=-1
        )
        kmask = jnp.broadcast_to(
            _mask_lane(sk, kv_len, 0, k.dtype)[None], (g, sk, 1)
        )
        k = jnp.concatenate([k, kmask], axis=-1)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # [H, Sq, Sk], log2-space logits, padded keys pre-masked
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    # MXU-side row-sum via a ones column on v (see _fwd_kernel).
    v_aug = jnp.concatenate(
        [v, jnp.ones((v.shape[0], v.shape[1], 1), v.dtype)], axis=-1
    )
    o_aug = jax.lax.dot_general(
        p.astype(v.dtype), v_aug, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sq, dh + 1]
    dh = v.shape[2]
    l = o_aug[..., dh:]
    o = o_aug[..., :dh] / l
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log2(l)  # [H, Sq, 1], log2 space


def _bwd_kernel_allheads(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, dk_ref, dv_ref, *, scale, kv_len, q_len):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]      # [H, Sq, 1], log2 space
    delta = delta_ref[0]  # [H, Sq, 1]

    g, sq_pad, _ = q.shape
    sk_pad = k.shape[1]
    # Masks folded into extra MXU contraction lanes, same scheme as
    # _dkv_kernel (see _mask_lane): padded q rows and padded keys each
    # contribute a (mask lane, ones lane) pair so QK^T emits pre-masked
    # logits with zero VPU full-tile passes.
    q_lanes = [q * (scale * _LOG2E)]
    k_lanes = [k]
    if q_len < sq_pad:
        q_lanes.append(jnp.broadcast_to(
            _mask_lane(sq_pad, q_len, 0, q.dtype)[None], (g, sq_pad, 1)
        ))
        k_lanes.append(jnp.ones((g, sk_pad, 1), k.dtype))
    if kv_len < sk_pad:
        q_lanes.append(jnp.ones((g, sq_pad, 1), q.dtype))
        k_lanes.append(jnp.broadcast_to(
            _mask_lane(sk_pad, kv_len, 0, k.dtype)[None], (g, sk_pad, 1)
        ))
    qa = q_lanes[0] if len(q_lanes) == 1 else jnp.concatenate(q_lanes, -1)
    ka = k_lanes[0] if len(k_lanes) == 1 else jnp.concatenate(k_lanes, -1)
    s = jax.lax.dot_general(
        qa, ka, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sq, Sk], pre-masked
    p = jnp.exp2(s - lse)

    dp = jax.lax.dot_general(
        do * scale, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sq, Sk]; scale folded into the do tile
    ds = p * (dp - delta * scale)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sk, dh]
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sk, dh]
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _head_group(h: int, sq_pad: int, sk_pad: int, n_buffers: int) -> int:
    """Largest divisor of h whose n_buffers x [g, Sq, Sk] fp32 working set
    fits the VMEM budget; 0 when even one head does not fit (use the
    blocked path). The backward kernel keeps ~4 logits-sized live buffers
    (s, p, dp, ds), the forward ~2 (s/p, exp)."""
    per_head = sq_pad * sk_pad * 4 * n_buffers
    if per_head > _LOGITS_VMEM_BUDGET:
        return 0
    g = min(h, _LOGITS_VMEM_BUDGET // per_head)
    while h % g:
        g -= 1
    return g


# ---------------------------------------------------------------------------
# Flat-layout variant: kernels read the MODEL's [B, S, H*dh] layout directly
# through paired-head lane blocks, so q/k/v never get transposed to
# [B, H, S, dh]. Inputs to pallas_call cannot be fusion consumers, so the
# BSHD->BHSD transposes of the path above materialize as HBM copies
# (~0.28 ms/call at ViT-L/518: 4 arrays x 22.5 MB; BENCH.md roofline) —
# while a [B, S, H*dh] view of the model's qkv GEMM output is free. Each
# grid step owns a (1, S_pad, g*dh) block where g = lcm(128, dh)/dh heads
# make the lane dim a 128 multiple; heads are separated by in-kernel
# 64-lane slices, which cost nothing (measured: 0.756 ms vs 1.153 ms
# through the transposing wrapper at 518, bit-identical).
# ---------------------------------------------------------------------------


def _flat_group(dh: int) -> int:
    """Heads per lane block: smallest g with (g*dh) % 128 == 0."""
    import math

    return _LANE // math.gcd(dh, _LANE)


def _fwd_kernel_flat(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len,
                     dh, g):
    """Forward over one (batch, head-group) block in flat layout.

    Same math as _fwd_kernel (base-2 softmax, MXU row-sum via a ones lane
    on v, MXU-folded key mask), applied per in-block head slice."""
    q_all = q_ref[0]  # [S_pad, g*dh]
    k_all = k_ref[0]
    v_all = v_ref[0]
    s_pad = k_all.shape[0]
    outs, lses = [], []
    for j in range(g):
        sl = slice(j * dh, (j + 1) * dh)
        q = q_all[:, sl] * (scale * _LOG2E)
        k = k_all[:, sl]
        v = v_all[:, sl]
        if kv_len < s_pad:
            q = jnp.concatenate(
                [q, jnp.ones((q.shape[0], 1), q.dtype)], axis=-1
            )
            k = jnp.concatenate(
                [k, _mask_lane(s_pad, kv_len, 0, k.dtype)], axis=-1
            )
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_pad, S_pad], log2-space logits, padded keys pre-masked
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        v_aug = jnp.concatenate(
            [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1
        )
        o_aug = jax.lax.dot_general(
            p.astype(v.dtype), v_aug, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = o_aug[:, dh:]
        outs.append((o_aug[:, :dh] / l).astype(o_ref.dtype))
        lses.append(m + jnp.log2(l))
    o_ref[0] = outs[0] if g == 1 else jnp.concatenate(outs, axis=-1)
    # lse is stored [B, H//g, S_pad, g] so the (1, 1, S_pad, g) block's
    # trailing dims equal the full array dims (Mosaic's block-shape rule
    # forbids a lane-dim block of g < 128 on a [B, S_pad, H] layout).
    lse_ref[0, 0] = lses[0] if g == 1 else jnp.concatenate(lses, axis=-1)


def _bwd_kernel_flat(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref, dq_ref, *, scale, kv_len, dh, g,
                     block_k, mask_keys):
    """Fused flat backward over k-blocks: dk/dv for this block plus the
    block's dq contribution, accumulated into a revisited fp32 output
    across the sequential innermost grid dim (same scheme as _dkv_kernel).

    No q-row mask is needed here: the flat forward computes lse over ALL
    padded rows (consistent with whatever activations they carry), so
    p = exp2(s - lse) is a proper softmax row, and padded q rows receive
    exactly-zero cotangents from the caller's final slice — their ds rows
    vanish identically."""
    ki = pl.program_id(2)
    dks, dvs, dqs = [], [], []
    for j in range(g):
        sl = slice(j * dh, (j + 1) * dh)
        q = q_ref[0][:, sl]       # [S_pad, dh]
        k = k_ref[0][:, sl]       # [bk, dh]
        v = v_ref[0][:, sl]
        do = do_ref[0][:, sl]     # [S_pad, dh]
        lse = lse_ref[0, 0][:, j:j + 1]      # [S_pad, 1], log2 space
        delta = delta_ref[0, 0][:, j:j + 1]  # [S_pad, 1]

        q_lanes = [q * (scale * _LOG2E)]
        k_lanes = [k]
        if mask_keys:
            q_lanes.append(jnp.ones((q.shape[0], 1), q.dtype))
            k_lanes.append(
                _mask_lane(k.shape[0], kv_len, ki * block_k, k.dtype)
            )
        qa = q_lanes[0] if len(q_lanes) == 1 else jnp.concatenate(q_lanes, -1)
        ka = k_lanes[0] if len(k_lanes) == 1 else jnp.concatenate(k_lanes, -1)
        s = jax.lax.dot_general(
            qa, ka, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_pad, bk], pre-masked
        p = jnp.exp2(s - lse)

        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, dh]
        dp = jax.lax.dot_general(
            do * scale, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_pad, bk]; scale folded into the do tile
        ds = p * (dp - delta * scale)
        dk = jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bk, dh]; dk uses the ORIGINAL (unscaled) q
        dq_c = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S_pad, dh]
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
        dqs.append(dq_c)
    dk_all = dks[0] if g == 1 else jnp.concatenate(dks, axis=-1)
    dv_all = dvs[0] if g == 1 else jnp.concatenate(dvs, axis=-1)
    dq_all = dqs[0] if g == 1 else jnp.concatenate(dqs, axis=-1)
    dk_ref[0] = dk_all
    dv_ref[0] = dv_all

    @pl.when(ki == 0)
    def _init():
        dq_ref[0] = dq_all

    @pl.when(ki > 0)
    def _acc():
        dq_ref[0] += dq_all


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_flat(q, k, v, scale, dh, interpret, kv_len, g):
    out, _ = _flash_flat_fwd(q, k, v, scale, dh, interpret, kv_len, g)
    return out


def _flash_flat_fwd(q, k, v, scale, dh, interpret, kv_len, g):
    b, s_pad, d = q.shape
    h = d // dh
    spec = pl.BlockSpec((1, s_pad, g * dh), lambda bi, hi: (bi, 0, hi))
    lspec = pl.BlockSpec((1, 1, s_pad, g), lambda bi, hi: (bi, hi, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel_flat, scale=scale, kv_len=kv_len, dh=dh, g=g
        ),
        grid=(b, h // g),
        in_specs=[spec, spec, spec],
        out_specs=[spec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h // g, s_pad, g), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_flat_fwd_vjp(q, k, v, scale, dh, interpret, kv_len, g):
    return _flash_flat_fwd(q, k, v, scale, dh, interpret, kv_len, g)


def _flash_flat_bwd(scale, dh, interpret, kv_len, g, res, gout):
    return _flat_bwd_impl(scale, dh, interpret, kv_len, g, res, gout)


def _flat_bwd_impl(scale, dh, interpret, kv_len, g, res, gout, glse2=None):
    q, k, v, out, lse = res
    b, s_pad, d = q.shape
    h = d // dh

    # delta = rowsum_per_head(dO * O), laid out [B, H//g, S_pad, g] to
    # match the lse storage layout (see _flash_flat_fwd).
    delta = jnp.transpose(
        jnp.sum(
            (gout.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
                b, s_pad, h // g, g, dh
            ),
            axis=-1,
        ),
        (0, 2, 1, 3),
    )
    if glse2 is not None:
        # Cotangent of the (log2-space) lse output folds into the delta
        # term: the kernel computes ds = p * (dp - delta*scale) w.r.t.
        # QK^T, and d lse2/d(QK^T) = p * scale * log2e, so passing
        # delta' = delta - glse2*log2e adds exactly the lse contribution.
        # dv is untouched (lse has no v dependence). No kernel changes.
        delta = delta - glse2 * _LOG2E

    block_k = _auto_block(s_pad, s_pad, n_buffers=4)
    sk_pad = _round_up(s_pad, block_k)
    kp, vp = k, v
    if sk_pad != s_pad:
        padw = ((0, 0), (0, sk_pad - s_pad), (0, 0))
        kp, vp = jnp.pad(k, padw), jnp.pad(v, padw)
    mask_keys = kv_len < sk_pad

    qspec = pl.BlockSpec((1, s_pad, g * dh), lambda bi, hi, ki: (bi, 0, hi))
    kspec = pl.BlockSpec((1, block_k, g * dh), lambda bi, hi, ki: (bi, ki, hi))
    lspec = pl.BlockSpec((1, 1, s_pad, g), lambda bi, hi, ki: (bi, hi, 0, 0))
    dk, dv, dq = pl.pallas_call(
        functools.partial(
            _bwd_kernel_flat, scale=scale, kv_len=kv_len, dh=dh, g=g,
            block_k=block_k, mask_keys=mask_keys,
        ),
        grid=(b, h // g, sk_pad // block_k),
        in_specs=[qspec, kspec, kspec, qspec, lspec, lspec],
        out_specs=[kspec, kspec, qspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, d), v.dtype),
            jax.ShapeDtypeStruct((b, s_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, kp, vp, gout, lse, delta)
    return dq.astype(q.dtype), dk[:, :s_pad], dv[:, :s_pad]


_flash_flat.defvjp(_flash_flat_fwd_vjp, _flash_flat_bwd)


# Flat-layout variant that ALSO returns the (log2-space, kernel-layout)
# lse as a differentiable output — the building block ring attention's
# per-ring-step local attention needs to merge partial softmaxes across
# ring steps (ops/ring_attention.py). The lse cotangent rides the existing
# backward kernels through the delta term (see _flat_bwd_impl).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_flat_lse(q, k, v, scale, dh, interpret, kv_len, g):
    out, res = _flash_flat_fwd(q, k, v, scale, dh, interpret, kv_len, g)
    return out, res[-1]


def _flash_flat_lse_fwd(q, k, v, scale, dh, interpret, kv_len, g):
    out, res = _flash_flat_fwd(q, k, v, scale, dh, interpret, kv_len, g)
    return (out, res[-1]), res


def _flash_flat_lse_bwd(scale, dh, interpret, kv_len, g, res, cts):
    gout, glse2 = cts
    return _flat_bwd_impl(
        scale, dh, interpret, kv_len, g, res, gout, glse2=glse2
    )


_flash_flat_lse.defvjp(_flash_flat_lse_fwd, _flash_flat_lse_bwd)


def _flat_block_group(h: int, dh: int, s_pad: int) -> int:
    """Heads per flat grid step: a multiple of the minimal lane group
    (so the lane block stays a 128 multiple) that divides h.

    On-chip sweep (v5e, bf16): at S_pad=272 larger groups amortize grid
    launches (g=12: fwd 0.223 ms vs g=2's 0.301) — take the largest
    valid group when the per-group logits footprint is small; at
    S_pad=1376 only the minimal group compiles (larger groups exceed
    VMEM: 2 fp32 [S,S] tiles + g*dh-lane block buffers). The lane block
    g*dh is additionally capped at 1024: ViT-giant (h=24, dh=64) at the
    full h=24 group makes a 1536-lane block whose fused dq backward
    exceeds the 16 MB scoped-VMEM limit under remat (23.4 MB measured);
    1024 is the widest measured-safe width (ViT-L's 16 x 64)."""
    g0 = _flat_group(dh)
    if s_pad <= 512:
        g_cap = max(g0, 1024 // dh)
        for g in range(min(h, g_cap), 0, -1):
            if h % g == 0 and g % g0 == 0:
                return g
    return g0


def _flat_eligible(q, k) -> bool:
    """Flat path: self-attention shapes whose whole-seq logits tile fits
    VMEM and whose head count divides into 128-lane groups. The VMEM
    guard is empirical: S_pad=1376 (ViT-L/518) compiles and wins on v5e
    (~2 live fp32 logits tiles after Mosaic's buffer reuse).

    Measured (v5e, bf16): at S_pad=1376 flat wins fwd -9% / fwd+bwd
    -16% over the transposing BHSD path; at S_pad=272 the flat kernel in
    isolation trails the BHSD all-heads path (0.223 vs 0.128 ms fwd at
    the largest head group) but wins IN-MODEL (full ViT-B step 1449 ->
    1540 img/s) because it also eliminates the [B,S,H,dh] relayout
    copies XLA emits around the transposing call. Flat is therefore the
    default wherever it fits; the BHSD family remains for
    cross-attention, non-dividing head counts, and explicit block_q."""
    b, sq, h, dh = q.shape
    if sq != k.shape[1]:
        return False
    g = _flat_group(dh)
    if h % g:
        return False
    s_pad = _round_up(sq, _SUBLANE)
    return 2 * s_pad * s_pad * 4 <= 18 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bhsd(q, k, v, scale, block_q, interpret, kv_len):
    out, _ = _flash_fwd(q, k, v, scale, block_q, interpret, kv_len)
    return out


def _flash_fwd(q, k, v, scale, block_q, interpret, kv_len=None):
    b, h, sq, dh = q.shape
    sk = kv_len if kv_len is not None else k.shape[2]
    sk_pad = _round_up(k.shape[2], _SUBLANE)
    if block_q is None:
        block_q = _auto_block(sq, sk_pad)
    elif sq <= block_q:
        # Single q block: pad only to the sublane multiple (e.g. 257 -> 272
        # instead of 512), which matters at ViT @224 where s is small.
        block_q = _round_up(sq, _SUBLANE)
    sq_pad = _round_up(sq, block_q)
    qp, kp, vp = _pad_seq(q, sq_pad), _pad_seq(k, sk_pad), _pad_seq(v, sk_pad)

    g_fwd = _head_group(h, sq_pad, sk_pad, n_buffers=2)
    if g_fwd > 1 or (g_fwd == 1 and sq_pad == _round_up(sq, _SUBLANE)):
        spec = pl.BlockSpec((1, g_fwd, sq_pad, dh), lambda bi, hi: (bi, hi, 0, 0))
        kvspec = pl.BlockSpec((1, g_fwd, sk_pad, dh), lambda bi, hi: (bi, hi, 0, 0))
        lspec = pl.BlockSpec((1, g_fwd, sq_pad, 1), lambda bi, hi: (bi, hi, 0, 0))
        out, lse = pl.pallas_call(
            functools.partial(_fwd_kernel_allheads, scale=scale, kv_len=sk),
            grid=(b, h // g_fwd),
            in_specs=[spec, kvspec, kvspec],
            out_specs=[spec, lspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, sq_pad, dh), q.dtype),
                jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
            ],
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :, :sq], (q, k, v, out[:, :, :sq], lse)

    grid = (b, h, sq_pad // block_q)
    kv_spec = pl.BlockSpec(
        (1, 1, sk_pad, dh), lambda bi, hi, qi: (bi, hi, 0, 0)
    )
    q_spec = pl.BlockSpec(
        (1, 1, block_q, dh), lambda bi, hi, qi: (bi, hi, qi, 0)
    )
    # lse kept 4D [B, H, S, 1] so its blocks satisfy TPU tiling rules.
    lse_spec = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0))

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=sk),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_pad, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :sq], (q, k, v, out[:, :, :sq], lse)


def _flash_fwd_vjp(q, k, v, scale, block_q, interpret, kv_len):
    out, res = _flash_fwd(q, k, v, scale, block_q, interpret, kv_len)
    return out, res


def _flash_bwd(scale, block_q, interpret, kv_len, res, g):
    return _bhsd_bwd_impl(scale, block_q, interpret, kv_len, res, g)


def _bhsd_bwd_impl(scale, block_q, interpret, kv_len, res, g, glse2=None):
    q, k, v, out, lse = res
    b, h, sq, dh = q.shape
    sk = kv_len if kv_len is not None else k.shape[2]
    sk_phys = k.shape[2]
    # The fused blocked backward stages the WHOLE q/do/lse/delta per
    # (b, h) (the k-block grid revisits them), so q only needs sublane
    # rounding — block_q never constrains the backward. An explicit
    # block_q still forces the blocked path (test coverage of the fused
    # kernel on shapes the all-heads branch would otherwise take).
    force_blocked = block_q is not None
    sq_pad = _round_up(sq, _SUBLANE)
    # dk/dv iterate over k blocks; ~4 [sq_pad, block_k] buffers live.
    block_k = _auto_block(sk_phys, sq_pad, n_buffers=4)
    sk_pad = _round_up(sk_phys, block_k)

    # delta = rowsum(dO * O), in fp32 (cheap; computed outside the kernel).
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # [b, h, sq, 1]

    qp, kp, vp = _pad_seq(q, sq_pad), _pad_seq(k, sk_pad), _pad_seq(v, sk_pad)
    dop = _pad_seq(g, sq_pad)
    # lse was saved at the FORWARD's padded length, which can differ from
    # the backward's (different n_buffers -> different auto block). It
    # must be exactly sq_pad rows: shorter would make the pallas specs
    # read past the array (undefined values -> exp(s - garbage) NaNs in
    # dk/dv; the q_len mask then zeroes the padded rows of the zero-pad).
    lse_len = lse.shape[2]
    if lse_len < sq_pad:
        lsep = _pad_seq(lse, sq_pad)
    elif lse_len > sq_pad:
        lsep = lse[:, :, :sq_pad]
    else:
        lsep = lse
    deltap = _pad_seq(delta, sq_pad)
    if glse2 is not None:
        # lse-output cotangent folded into delta (see _flat_bwd_impl).
        # glse2 arrives at the FORWARD's padded length, like lse.
        gl = glse2
        if gl.shape[2] < sq_pad:
            gl = _pad_seq(gl, sq_pad)
        elif gl.shape[2] > sq_pad:
            gl = gl[:, :, :sq_pad]
        deltap = deltap - gl * _LOG2E

    g_bwd = _head_group(h, sq_pad, sk_pad, n_buffers=5)
    if g_bwd >= 1 and not force_blocked:
        spec = pl.BlockSpec((1, g_bwd, sq_pad, dh), lambda bi, hi: (bi, hi, 0, 0))
        kvspec = pl.BlockSpec((1, g_bwd, sk_pad, dh), lambda bi, hi: (bi, hi, 0, 0))
        lspec = pl.BlockSpec((1, g_bwd, sq_pad, 1), lambda bi, hi: (bi, hi, 0, 0))
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_kernel_allheads, scale=scale, kv_len=sk, q_len=sq
            ),
            grid=(b, h // g_bwd),
            in_specs=[spec, kvspec, kvspec, spec, lspec, lspec],
            out_specs=[spec, kvspec, kvspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, sq_pad, dh), q.dtype),
                jax.ShapeDtypeStruct((b, h, sk_pad, dh), k.dtype),
                jax.ShapeDtypeStruct((b, h, sk_pad, dh), v.dtype),
            ],
            interpret=interpret,
        )(qp, kp, vp, dop, lsep, deltap)
        return dq[:, :, :sq], dk[:, :, :sk_phys], dv[:, :, :sk_phys]

    qfull_spec = pl.BlockSpec((1, 1, sq_pad, dh), lambda bi, hi, i: (bi, hi, 0, 0))
    kvblk_spec = pl.BlockSpec((1, 1, block_k, dh), lambda bi, hi, i: (bi, hi, i, 0))
    lsefull_spec = pl.BlockSpec((1, 1, sq_pad, 1), lambda bi, hi, i: (bi, hi, 0, 0))

    # Single fused kernel over k-blocks: dq is a REVISITED output (its
    # index map ignores the k index), accumulated in fp32 in VMEM across
    # the sequential innermost grid dim and flushed once per (b, h).
    dk, dv, dq = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, q_len=sq, kv_len=sk, block_k=block_k,
            mask_keys=sk < sk_pad,
        ),
        grid=(b, h, sk_pad // block_k),
        in_specs=[
            qfull_spec, kvblk_spec, kvblk_spec, qfull_spec,
            lsefull_spec, lsefull_spec,
        ],
        out_specs=[kvblk_spec, kvblk_spec, qfull_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sk_pad, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk_pad, dh), v.dtype),
            jax.ShapeDtypeStruct((b, h, sq_pad, dh), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :, :sq].astype(q.dtype), dk[:, :, :sk_phys], dv[:, :, :sk_phys]


_flash_bhsd.defvjp(_flash_fwd_vjp, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_bhsd_lse(q, k, v, scale, block_q, interpret, kv_len):
    out, res = _flash_fwd(q, k, v, scale, block_q, interpret, kv_len)
    return out, res[-1]


def _flash_bhsd_lse_fwd(q, k, v, scale, block_q, interpret, kv_len):
    out, res = _flash_fwd(q, k, v, scale, block_q, interpret, kv_len)
    return (out, res[-1]), res


def _flash_bhsd_lse_bwd(scale, block_q, interpret, kv_len, res, cts):
    gout, glse2 = cts
    return _bhsd_bwd_impl(
        scale, block_q, interpret, kv_len, res, gout, glse2=glse2
    )


_flash_bhsd_lse.defvjp(_flash_bhsd_lse_fwd, _flash_bhsd_lse_bwd)

_LN2 = 0.6931471805599453


def flash_attention_lse(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
    kv_len: int | None = None,
    flat: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused attention returning the per-row logsumexp as a second
    differentiable output.

    This is the kernel interface ring attention (ops/ring_attention.py)
    needs: each ring step computes local attention over one rotated K/V
    shard with the Pallas kernel, and the partial (o, lse) pairs merge in
    log-sum-exp form across steps. Both outputs carry exact gradients —
    the lse cotangent folds into the backward kernels' delta term, so the
    fused backward runs unchanged.

    Args mirror `flash_attention`. Returns:
      o:   [B, Sq, H, Dh] (q.dtype)
      lse: [B, Sq, H] fp32, NATURAL-log space: log(sum_k exp(s_qk)) with
           s the scaled logits. (The kernels store log2-space lse
           internally; the conversion is a cheap elementwise multiply.)
    """
    b, sq, h, dh = q.shape
    if flat is None:
        flat = _flat_eligible(q, k)
    if flat:
        s_pad = _round_up(sq, _SUBLANE)
        kvl = kv_len if kv_len is not None else sq
        g = _flat_block_group(h, dh, s_pad)
        qf = q.reshape(b, sq, h * dh)
        kf = k.reshape(b, sq, h * dh)
        vf = v.reshape(b, sq, h * dh)
        if sq != s_pad:
            padw = ((0, 0), (0, s_pad - sq), (0, 0))
            qf, kf, vf = jnp.pad(qf, padw), jnp.pad(kf, padw), jnp.pad(vf, padw)
        out, lse2 = _flash_flat_lse(qf, kf, vf, scale, dh, interpret, kvl, g)
        o = out[:, :sq].reshape(b, sq, h, dh)
        # lse2: [B, H//g, S_pad, g], head index = group*g + lane.
        lse = (
            jnp.transpose(lse2, (0, 2, 1, 3)).reshape(b, s_pad, h)[:, :sq]
            * _LN2
        )
        return o, lse
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out, lse2 = _flash_bhsd_lse(qt, kt, vt, scale, None, interpret, kv_len)
    o = jnp.transpose(out, (0, 2, 1, 3))
    # lse2: [B, H, S_pad_fwd, 1] (forward-padded length).
    lse = jnp.transpose(lse2[:, :, :sq, 0], (0, 2, 1)) * _LN2
    return o, lse


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int | None = None,
    interpret: bool = False,
    kv_len: int | None = None,
    flat: bool | None = None,
) -> jnp.ndarray:
    """Fused attention.

    Args:
      q: [B, Sq, H, Dh]; k, v: [B, Sk, H, Dh] (model layout).
      scale: softmax scale (1/sqrt(Dh)).
      block_q: explicit q-block (testing hook; forces the BHSD blocked
        path).
      interpret: run in Pallas interpreter mode (CPU tests).
      kv_len: true key count when the caller pre-padded the sequence (keys
        at positions >= kv_len are masked out of the softmax and their
        dk/dv are exactly zero). Lets the whole network run at a
        lane-friendly padded length with no per-call HBM pad ops.
      flat: force (True) or forbid (False) the flat-layout kernels; None
        selects them automatically for eligible self-attention shapes.

    Returns:
      [B, Sq, H, Dh]

    Two kernel families sit behind this wrapper:
    - FLAT (default when eligible): the kernels read a [B, S, H*dh] VIEW
      of the inputs through paired-head lane blocks, so the model layout
      is consumed directly — no BSHD->BHSD transpose copies (pallas_call
      inputs cannot be fusion consumers, so those transposes materialize
      in HBM: ~0.28 ms/call at ViT-L/518, BENCH.md roofline).
    - BHSD: transposes to [B, H, S, dh] and runs the head-grouped or
      q/k-blocked kernels; covers cross-attention, odd head counts and
      sequences too long for whole-seq VMEM staging.
    """
    if flat is None:
        flat = block_q is None and _flat_eligible(q, k)
    if flat:
        b, sq, h, dh = q.shape
        s_pad = _round_up(sq, _SUBLANE)
        kvl = kv_len if kv_len is not None else sq
        qf = q.reshape(b, sq, h * dh)
        kf = k.reshape(b, sq, h * dh)
        vf = v.reshape(b, sq, h * dh)
        if sq != s_pad:
            padw = ((0, 0), (0, s_pad - sq), (0, 0))
            qf, kf, vf = jnp.pad(qf, padw), jnp.pad(kf, padw), jnp.pad(vf, padw)
        out = _flash_flat(
            qf, kf, vf, scale, dh, interpret, kvl,
            _flat_block_group(h, dh, s_pad),
        )
        return out[:, :sq].reshape(b, sq, h, dh)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _flash_bhsd(qt, kt, vt, scale, block_q, interpret, kv_len)
    return jnp.transpose(out, (0, 2, 1, 3))
