"""Attention-kernel batch-scaling probe (VERDICT r2 item 2: b64 >= b32).

BENCH.md "Batch-64 regression": the isolated kernel at S=272 H=12 bf16
measured fwd 0.162 -> 0.392 ms and fwd+bwd 0.618 -> 1.599 ms from b32 to
b64 (2.4-2.6x instead of 2x). This probe times the kernel across batch
sizes and grid strategies (all-heads vs forced head-group vs per-head
blocked) to find a configuration whose per-image cost does not degrade at
larger batch.

Usage: python tools/bench_attn_scaling.py [--seq 272] [--heads 12]
       [--dh 64] [--kv_len 257]
Prints one JSON line per (batch, variant).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seq", type=int, default=272)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--dh", type=int, default=64)
    p.add_argument("--kv_len", type=int, default=257)
    p.add_argument("--batches", type=int, nargs="+", default=[32, 64])
    p.add_argument("--groups", type=int, nargs="+", default=[0, 6, 4, 2, 1],
                   help="forced head-group sizes; 0 = library default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.ops import flash_attention as fa
    from dinov2_od_tpu.utils.benchmark import time_fn

    scale = 1.0 / np.sqrt(args.dh)
    default_head_group = fa._head_group

    for b in args.batches:
        rng = np.random.default_rng(0)
        q, k, v = (
            jnp.asarray(
                rng.normal(size=(b, args.seq, args.heads, args.dh))
                .astype(np.float32)
            ).astype(jnp.bfloat16)
            for _ in range(3)
        )

        def fwd(q, k, v):
            return fa.flash_attention(q, k, v, scale=scale, kv_len=args.kv_len)

        def fwdbwd(q, k, v):
            def loss(q, k, v):
                return jnp.sum(
                    fa.flash_attention(
                        q, k, v, scale=scale, kv_len=args.kv_len
                    ).astype(jnp.float32) ** 2
                )
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        for g in args.groups:
            if g == 0:
                fa._head_group = default_head_group
                label = "default"
            else:
                if args.heads % g:
                    continue
                fa._head_group = (
                    lambda h, sq, sk, n_buffers, _g=g: _g
                    if default_head_group(h, sq, sk, n_buffers) >= _g else 0
                )
                label = f"group{g}"
            try:
                t_f = time_fn(fwd, q, k, v)
                t_fb = time_fn(fwdbwd, q, k, v)
                print(json.dumps({
                    "batch": b, "variant": label,
                    "fwd_ms": round(t_f * 1e3, 4),
                    "fwdbwd_ms": round(t_fb * 1e3, 4),
                    "fwd_us_per_img": round(t_f * 1e6 / b, 2),
                    "fwdbwd_us_per_img": round(t_fb * 1e6 / b, 2),
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "batch": b, "variant": label, "error": str(e)[:120]
                }), flush=True)
    fa._head_group = default_head_group


if __name__ == "__main__":
    main()
