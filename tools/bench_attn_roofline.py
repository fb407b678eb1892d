"""Roofline decomposition of the flash-attention FORWARD at a given shape.

VERDICT r2 #3 asks for >=110 img/s at ViT-L/518 or "a written roofline
argument showing ~90 is the ceiling". This probe produces the data for
that argument: it times ablated variants of the production forward kernel
(same grid, same VMEM staging, same dtypes) that successively remove the
softmax's VPU work, isolating

  1. mxu_only   — the two dot_generals with the softmax replaced by a
                  bf16 cast of the raw logits (the MXU floor: nothing the
                  kernel computes can be faster than its own matmuls),
  2. + max      — adds the row-max reduce (1 VPU traversal of [Sq, Sk]),
  3. + exp2     — adds exp2(s - m) (the transcendental traversal),
  4. production — the shipped kernel (adds the l-lane divide + lse write).

Each successive delta is the cost of one irreducible softmax component on
this hardware; their sum over the MXU floor is the VPU tax. If
(production - mxu_only) ~= sum of the component deltas and the floor is
near the chip's measured GEMM rate for these matmul shapes, the kernel is
at its speed-of-light and further forward gains require changing WHAT is
computed (e.g. approximate softmax), not how.

Usage: python tools/bench_attn_roofline.py [--seq 1370 --heads 16
       --batch 8 --dh 64] ; prints one JSON line per variant.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=1370)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from dinov2_od_tpu.ops import flash_attention as fa
    from dinov2_od_tpu.utils.benchmark import time_fn

    b, h, s, dh = args.batch, args.heads, args.seq, args.dh
    scale = 1.0 / np.sqrt(dh)
    s_pad = fa._round_up(s, fa._SUBLANE)

    rng = np.random.default_rng(0)
    qp, kp, vp = (
        jnp.asarray(
            rng.normal(size=(b, h, s_pad, dh)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for _ in range(3)
    )

    def kernel(q_ref, k_ref, v_ref, o_ref, *, stage):
        q = q_ref[0, 0] * (scale * fa._LOG2E)
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        sλ = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if stage == "mxu_only":
            p = sλ
        elif stage == "plus_max":
            m = jnp.max(sλ, axis=-1, keepdims=True)
            p = sλ - m
        else:  # plus_exp2
            m = jnp.max(sλ, axis=-1, keepdims=True)
            p = jnp.exp2(sλ - m)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, 0] = o.astype(o_ref.dtype)

    spec = pl.BlockSpec((1, 1, s_pad, dh), lambda bi, hi: (bi, hi, 0, 0))

    def run_variant(stage):
        f = pl.pallas_call(
            functools.partial(kernel, stage=stage),
            grid=(b, h),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, dh), jnp.bfloat16),
        )
        return min(time_fn(f, qp, kp, vp) for _ in range(args.repeats))

    def run_production():
        def f(q, k, v):
            return fa._flash_bhsd(q, k, v, scale, None, False, s)
        return min(time_fn(f, qp, kp, vp) for _ in range(args.repeats))

    matmul_flops = 2 * (2 * s_pad * s_pad * dh) * b * h
    prev = None
    for stage in ("mxu_only", "plus_max", "plus_exp2"):
        t = run_variant(stage)
        rec = {
            "variant": stage,
            "ms": round(t * 1e3, 4),
            "mxu_tf_s": round(matmul_flops / t / 1e12, 1),
        }
        if prev is not None:
            rec["delta_ms_vs_prev"] = round((t - prev) * 1e3, 4)
        prev = t
        print(json.dumps(rec), flush=True)
    t = run_production()
    print(json.dumps({
        "variant": "production",
        "ms": round(t * 1e3, 4),
        "mxu_tf_s": round(matmul_flops / t / 1e12, 1),
        "delta_ms_vs_prev": round((t - prev) * 1e3, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
