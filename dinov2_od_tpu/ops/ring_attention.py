"""Ring attention: exact attention with the sequence sharded over a mesh
axis (context / sequence parallelism).

The reference has no long-context story (SURVEY.md §5: fixed 257-1370
tokens). This provides one for high-resolution inputs beyond a single
chip's memory: Q stays local, K/V blocks rotate around the ring via
`ppermute` (ICI neighbor exchange), and partial softmax statistics merge
in log-sum-exp form — the classic flash/ring decomposition, expressed with
`shard_map` so XLA schedules the collective-compute overlap.

Exactness: identical to full attention up to fp32 summation order
(validated against the XLA path on an 8-device CPU mesh in
tests/test_ring_attention.py), including the backward pass (shard_map +
ppermute are differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    mesh: Mesh,
    axis: str = "data",
    valid_len: int | None = None,
) -> jnp.ndarray:
    """Exact attention with S sharded over `axis`.

    Args:
      q, k, v: [B, S, H, Dh] global arrays, sequence dim sharded over
        `axis` (S must divide evenly by the axis size).
      mesh: the device mesh containing `axis`.
      valid_len: if set, keys at global positions >= valid_len are
        masked out (finite -1e30 logits, so a fully-masked first ring
        block cannot NaN the running softmax). Lets callers pad S up to
        a shard multiple without changing the result for real queries.

    Returns:
      [B, S, H, Dh], sharded like q.
    """

    def local(q_loc, k_loc, v_loc):
        n = jax.lax.psum(1, axis)
        my = jax.lax.axis_index(axis)

        b, sq, h, dh = q_loc.shape
        m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, sq), jnp.float32)
        o0 = jnp.zeros((b, sq, h, dh), jnp.float32)

        def body(i, carry):
            m, l, o, k_cur, v_cur = carry
            s = (
                jnp.einsum("bqhd,bkhd->bhqk", q_loc, k_cur).astype(jnp.float32)
                * scale
            )
            if valid_len is not None:
                # After i rotations this device holds the K/V shard that
                # originated on ring position (my - i) mod n.
                src = jax.lax.rem(my - i + n, n)
                kpos = src * sq + jnp.arange(sq)
                s = jnp.where(kpos[None, None, None, :] < valid_len, s, -1e30)
            m_blk = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m, m_blk)
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1)
            o = o * jnp.transpose(corr, (0, 2, 1))[..., None] + jnp.einsum(
                "bhqk,bkhd->bqhd", p.astype(v_cur.dtype), v_cur
            ).astype(jnp.float32)
            # Rotate k/v to the next ring neighbor.
            perm = [(j, (j + 1) % n) for j in range(n)]
            k_cur = jax.lax.ppermute(k_cur, axis, perm)
            v_cur = jax.lax.ppermute(v_cur, axis, perm)
            return (m_new, l, o, k_cur, v_cur)

        m, l, o, _, _ = jax.lax.fori_loop(
            0, n, body, (m0, l0, o0, k_loc, v_loc)
        )
        out = o / jnp.transpose(l, (0, 2, 1))[..., None]
        return out.astype(q_loc.dtype)

    spec = P(None, axis, None, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
