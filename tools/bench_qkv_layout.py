"""qkv parameter-layout microbenchmark (VERDICT r2 item 8).

Question: is storing q/k/v as one fused [D, 3D] parameter worth the
importer/exporter/TP-spec surgery? The backbone is FROZEN (base kernels
receive no gradients — the LoRA-boundary stop-gradient means there is no
backward dW concat/split at all), so the only cost of the current
per-projection storage is the per-block forward concat of three [D, D]
kernels into [D, 3D] before the fused activation GEMM
(models/vit.py:117-123).

This times the exact pattern: a 12-deep scan of x @ W where W is
(a) pre-fused [L, D, 3D] stacked storage, vs
(b) concat of three [L, D, D] stacked tensors per scan step,
at ViT-B b32 shapes, bf16. The difference x depth is the whole available
win of the refactor.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.utils.benchmark import time_fn

    b, s, d, depth = 32, 272, 768, 12
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(b, s, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    wq, wk, wv = (
        jnp.asarray(rng.normal(size=(depth, d, d)).astype(np.float32) * 0.02)
        .astype(jnp.bfloat16)
        for _ in range(3)
    )
    w_fused = jnp.concatenate([wq, wk, wv], axis=2)  # [L, D, 3D]

    def run_fused(x, w):
        def body(carry, wi):
            out = carry @ wi
            # fold 3D back to D so the carry shape is stable (sum the three
            # projections — stands in for the rest of the block)
            q, k, v = jnp.split(out, 3, axis=-1)
            return (q + k + v).astype(carry.dtype), None

        y, _ = jax.lax.scan(body, x, w)
        return y

    def run_concat(x, wq, wk, wv):
        def body(carry, ws):
            wi = jnp.concatenate([ws[0], ws[1], ws[2]], axis=1)
            out = carry @ wi
            q, k, v = jnp.split(out, 3, axis=-1)
            return (q + k + v).astype(carry.dtype), None

        y, _ = jax.lax.scan(body, x, (wq, wk, wv))
        return y

    t_fused = time_fn(run_fused, x, w_fused)
    t_concat = time_fn(run_concat, x, wq, wk, wv)
    print(json.dumps({
        "metric": f"12-deep qkv GEMM scan, b{b} s{s} d{d} bf16",
        "prefused_ms": round(t_fused * 1e3, 4),
        "per_step_concat_ms": round(t_concat * 1e3, 4),
        "delta_ms_per_fwd": round((t_concat - t_fused) * 1e3, 4),
    }))


if __name__ == "__main__":
    main()
