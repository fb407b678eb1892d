"""Ring attention: exact attention with the sequence sharded over a mesh
axis (context / sequence parallelism).

The reference has no long-context story (SURVEY.md §5: fixed 257-1370
tokens). This provides one for high-resolution inputs beyond a single
chip's memory: Q stays local, K/V blocks rotate around the ring via
`ppermute` (ICI neighbor exchange), and partial softmax statistics merge
in log-sum-exp form — the classic flash/ring decomposition, expressed with
`shard_map` so XLA schedules the collective-compute overlap.

Two inner-loop implementations (`impl`):

- 'flash' (the TPU default): each ring step's local attention is ONE
  Pallas flash-kernel call returning (o, lse)
  (ops/flash_attention.py:flash_attention_lse — the custom VJP carries
  exact lse gradients through the fused backward), and the per-step
  partials merge in log-sum-exp form. The local step then has the
  kernel's properties: probabilities never touch HBM, base-2 softmax,
  MXU-folded masks/row-sums, fused backward. Measured on the v5e chip at
  ViT-L/518 local shapes (B8 S1370 H16 dh64 bf16): fwd 2.22 -> 1.29 ms,
  fwd+bwd 11.9 -> 4.4 ms (2.7x) vs the blockwise impl; output
  bit-identical to the plain flash kernel (BENCH.md).
- 'blockwise': per ring step the local K/V shard is consumed in key
  sub-blocks with an online-softmax carry, so the largest live logits
  tile is [B, H, Sq_loc, block] fp32 (block <= 512) instead of the full
  [B, H, Sq_loc, Sk_loc]. Pure jnp — runs anywhere (CPU-mesh tests);
  the sub-block body is `jax.checkpoint`ed, so the backward recomputes
  probabilities per block instead of saving them.

Either way forward attention memory is linear in the local sequence.
Backward memory:

- flash impl: O(LOCAL) — a hand-written reverse-rotation custom VJP
  re-rotates K/V a second time in the backward, recomputes each step's
  kernel forward, feeds the merge-weighted cotangents (g_o_i = w_i g_o,
  g_lse_i = w_i ((o_i - o) . g_o), w_i = exp(lse_i - lse)) into the
  flash kernel's own VJP, and accumulates dk/dv in buffers that rotate
  WITH the shards so each contribution lands on its home device after
  the full cycle. Residuals are just (q, k, v, o, lse); cost is one
  extra forward recompute (~10% on fwd+bwd, measured).
- blockwise impl: AD through the rotation stores the per-ring-step K/V
  carries — O(global KV) per device, the standard ring AD cost.

Exactness: identical to full attention up to fp32 summation order
(validated against the XLA path on an 8-device CPU mesh in
tests/test_ring_attention.py), including the backward pass of BOTH
impls (the custom VJP is pinned by the same grad-equality tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

# Target key-block width for the inner loop: one fp32 logits tile
# [B, H, Sq_loc, 512] stays VMEM/cache-friendly while keeping the MXU
# matmuls wide enough to be efficient.
_RING_BLOCK = 512


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "data",
    batch_axis: str | None = None,
    head_axis: str | None = None,
    valid_len: int | None = None,
    block_size: int | None = None,
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """Exact attention with S sharded over `axis`.

    Args:
      q, k, v: [B, S, H, Dh] global arrays, sequence dim sharded over
        `axis` (S must divide evenly by the axis size).
      mesh: the device mesh containing `axis`.
      batch_axis: mesh axis the batch dim is sharded over (DP x CP).
        Without it the shard_map in_specs would all-gather the batch over
        the data axis and every device would compute ring attention for
        the full global batch — dp-times redundant compute plus
        resharding collectives per call.
      head_axis: mesh axis the HEAD dim is sharded over (CP x TP
        composition on a three-axis mesh). Attention is per-head, so the
        ring runs unchanged on head-local shapes: the ppermute rotates
        K/V within each head shard's ring, and no collective ever
        crosses the head axis.
      valid_len: if set, keys at global positions >= valid_len are
        masked out (finite -1e30 logits, so a fully-masked first ring
        block cannot NaN the running softmax — bogus contributions are
        washed out by the exp(m_old - m_new) = 0 correction once a real
        key appears). Lets callers pad S up to a shard multiple without
        changing the result for real queries.
      block_size: inner key-block width for the blockwise impl
        (None -> min(shard, 512)); the shard is split into the fewest
        equal blocks of at most this size.
      impl: 'flash' runs each ring step's local attention as ONE Pallas
        flash-kernel call returning (o, lse) (ops/flash_attention.py:
        flash_attention_lse) and merges the partial softmaxes across
        steps in log-sum-exp form — on TPU the local step then has the
        kernel's memory/VPU properties instead of materializing fp32
        logits tiles in HBM. 'blockwise' is the einsum online-softmax
        loop (always available; CPU tests). 'auto' -> flash on TPU.
      interpret: run the flash impl's kernels in Pallas interpreter mode
        (CPU-mesh tests of the flash path).

    Returns:
      [B, S, H, Dh], sharded like q.
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "blockwise"

    def local_flash(q_loc, k_loc, v_loc):
        from .flash_attention import flash_attention_lse

        sk = k_loc.shape[1]
        n_static = mesh.shape[axis]

        def attend(kvl):
            def f(q, k_cur, v_cur):
                return flash_attention_lse(
                    q, k_cur, v_cur, scale=scale, kv_len=kvl,
                    interpret=interpret,
                )
            return f

        if valid_len is None:
            branches = None
            step_attn = attend(None)
        else:
            # The key mask depends on which GLOBAL shard this ring step
            # holds, but every case has a STATIC local kv_len (the flash
            # kernels bake the mask into an MXU lane at trace time):
            # shards left of the boundary are fully valid (kv_len=sk),
            # exactly one shard straddles it (kv_len = valid_len mod sk),
            # shards right of it are fully masked (kv_len=0; their lse is
            # ~-1e30*scale, so exp(lse - m) washes their junk output out
            # of the merge exactly, gradients included).
            kvl_partial = valid_len - (valid_len // sk) * sk
            branches = [attend(sk), attend(kvl_partial), attend(0)]
            step_attn = None

        def one_step(src, q, k_cur, v_cur):
            if branches is None:
                return step_attn(q, k_cur, v_cur)
            case = jnp.where(
                (src + 1) * sk <= valid_len,
                0,
                jnp.where(src * sk < valid_len, 1, 2),
            )
            return jax.lax.switch(case, branches, q, k_cur, v_cur)

        perm = [(jj, (jj + 1) % n_static) for jj in range(n_static)]
        b, sq, h, dh = q_loc.shape

        def fwd_loop(q, k, v):
            # axis_index must be taken inside THIS trace: the custom_vjp
            # backward runs in its own trace, and a value captured from
            # the enclosing one would be a leaked tracer.
            n = jax.lax.psum(1, axis)
            my = jax.lax.axis_index(axis)
            o0 = jnp.zeros((b, sq, h, dh), jnp.float32)
            lse0 = jnp.full((b, sq, h), -jnp.inf, jnp.float32)

            def body(i, carry):
                o_c, lse_c, k_cur, v_cur = carry
                src = jax.lax.rem(my - i + n, n)
                o_i, lse_i = one_step(src, q, k_cur, v_cur)
                # Merge the partial softmax: o_new is the lse-weighted
                # average of the normalized partials.
                m = jnp.maximum(lse_c, lse_i)
                a = jnp.exp(lse_c - m)
                bb = jnp.exp(lse_i - m)
                denom = a + bb
                o_c = (
                    o_c * a[..., None]
                    + o_i.astype(jnp.float32) * bb[..., None]
                ) / denom[..., None]
                lse_c = m + jnp.log(denom)
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
                return (o_c, lse_c, k_cur, v_cur)

            o, lse, _, _ = jax.lax.fori_loop(
                0, n_static, body, (o0, lse0, k, v)
            )
            return o, lse

        # Hand-written reverse-rotation VJP: AD through the forward loop
        # would store the per-step K/V ring carries (O(global KV) per
        # device). Instead the backward re-rotates K/V a second time and
        # recomputes each step's kernel forward, so backward memory is
        # O(local): residuals are just (q, k, v, o, lse). Cotangent
        # calculus for the merge o = sum_i w_i o_i, w_i = exp(lse_i -
        # lse): g_o_i = w_i g_o and g_lse_i = w_i ((o_i - o) . g_o);
        # these feed the flash kernel's own VJP (exact lse gradients).
        # dk/dv contributions are added to accumulators that rotate WITH
        # the shards — after the full cycle (n rotations) each
        # contribution has travelled n - i hops and lands exactly on its
        # home device ((my + n - i) == (my - i) == src_i mod n).

        @jax.custom_vjp
        def ring_core(q, k, v):
            o, _ = fwd_loop(q, k, v)
            return o.astype(q.dtype)

        def ring_core_fwd(q, k, v):
            o, lse = fwd_loop(q, k, v)
            return o.astype(q.dtype), (q, k, v, o, lse)

        def ring_core_bwd(res, g):
            q, k, v, o, lse = res
            g32 = g.astype(jnp.float32)
            n = jax.lax.psum(1, axis)
            my = jax.lax.axis_index(axis)

            def body(i, carry):
                dq, dk_a, dv_a, k_cur, v_cur = carry
                src = jax.lax.rem(my - i + n, n)
                (o_i, lse_i), vjp_fn = jax.vjp(
                    lambda qq, kk, vv: one_step(src, qq, kk, vv),
                    q, k_cur, v_cur,
                )
                w = jnp.exp(lse_i - lse)  # [B, Sq, H]
                g_oi = g32 * w[..., None]
                g_lsei = (
                    jnp.sum(g32 * (o_i.astype(jnp.float32) - o), axis=-1)
                    * w
                )
                dq_i, dk_i, dv_i = vjp_fn((g_oi.astype(o_i.dtype), g_lsei))
                dq = dq + dq_i.astype(jnp.float32)
                dk_a = dk_a + dk_i.astype(jnp.float32)
                dv_a = dv_a + dv_i.astype(jnp.float32)
                k_cur = jax.lax.ppermute(k_cur, axis, perm)
                v_cur = jax.lax.ppermute(v_cur, axis, perm)
                dk_a = jax.lax.ppermute(dk_a, axis, perm)
                dv_a = jax.lax.ppermute(dv_a, axis, perm)
                return (dq, dk_a, dv_a, k_cur, v_cur)

            zeros = jnp.zeros(q.shape, jnp.float32)
            dq, dk_a, dv_a, _, _ = jax.lax.fori_loop(
                0, n_static, body, (zeros, zeros, zeros, k, v)
            )
            return (
                dq.astype(q.dtype),
                dk_a.astype(k.dtype),
                dv_a.astype(v.dtype),
            )

        ring_core.defvjp(ring_core_fwd, ring_core_bwd)
        return ring_core(q_loc, k_loc, v_loc)

    def local(q_loc, k_loc, v_loc):
        n = jax.lax.psum(1, axis)
        my = jax.lax.axis_index(axis)

        b, sq, h, dh = q_loc.shape
        sk = k_loc.shape[1]  # == sq (equal shards)

        # Fewest equal key sub-blocks of <= target width; pad the local
        # K/V once so every block is full (padded keys are masked).
        target = block_size or _RING_BLOCK
        n_sub = -(-sk // target)
        block = -(-sk // n_sub)
        pad = n_sub * block - sk
        if pad:
            padw = ((0, 0), (0, pad), (0, 0), (0, 0))
            k_loc = jnp.pad(k_loc, padw)
            v_loc = jnp.pad(v_loc, padw)
        needs_mask = pad > 0 or valid_len is not None

        m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, sq), jnp.float32)
        o0 = jnp.zeros((b, sq, h, dh), jnp.float32)

        def one_block(m, l, o, k_blk, v_blk, key_valid):
            """Online-softmax update for one [block]-wide key slab."""
            s = (
                jnp.einsum("bqhd,bkhd->bhqk", q_loc, k_blk).astype(jnp.float32)
                * scale
            )
            if needs_mask:
                s = jnp.where(key_valid[None, None, None, :], s, -1e30)
            m_blk = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m, m_blk)
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            o = o * jnp.transpose(corr, (0, 2, 1))[..., None] + jnp.einsum(
                "bhqk,bkhd->bqhd", p.astype(v_blk.dtype), v_blk
            ).astype(jnp.float32)
            return m_new, l, o

        # Recompute probabilities in the backward instead of storing a
        # [B, H, Sq, block] tile per sub-block (q_loc is loop-invariant,
        # hoisted once by the scan conversion).
        one_block = jax.checkpoint(one_block)

        def body(i, carry):
            m, l, o, k_cur, v_cur = carry
            # After i rotations this device holds the K/V shard that
            # originated on ring position (my - i) mod n.
            src = jax.lax.rem(my - i + n, n)

            def sub(j, c):
                m, l, o = c
                k_blk = jax.lax.dynamic_slice_in_dim(
                    k_cur, j * block, block, axis=1
                )
                v_blk = jax.lax.dynamic_slice_in_dim(
                    v_cur, j * block, block, axis=1
                )
                lp = j * block + jnp.arange(block)
                key_valid = lp < sk
                if valid_len is not None:
                    key_valid = key_valid & (src * sk + lp < valid_len)
                return one_block(m, l, o, k_blk, v_blk, key_valid)

            m, l, o = jax.lax.fori_loop(0, n_sub, sub, (m, l, o))
            # Rotate k/v to the next ring neighbor.
            perm = [(jj, (jj + 1) % n) for jj in range(n)]
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            return (m, l, o, k_cur, v_cur)

        m, l, o, _, _ = jax.lax.fori_loop(
            0, n, body, (m0, l0, o0, k_loc, v_loc)
        )
        out = o / jnp.transpose(l, (0, 2, 1))[..., None]
        return out.astype(q_loc.dtype)

    spec = P(batch_axis, axis, head_axis, None)
    return shard_map(
        local_flash if impl == "flash" else local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
