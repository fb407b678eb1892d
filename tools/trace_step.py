"""Capture and summarize a device trace of the benchmark train step.

Builds the same configuration as bench.py (env knobs: BENCH_MODEL,
BENCH_IMAGE_SIZE, BENCH_BATCH, BENCH_REMAT), runs a few steps under
jax.profiler, then parses the trace.json.gz and prints the device-time
distribution grouped by HLO op family (GEMMs, pallas attention,
transposes/copies, elementwise fusions, ...). This is the measurement
tool behind the round-2/3 perf work — the reference has no equivalent
(its TensorBoard graph tracing is disabled, train.py:665-669).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site BENCH_MODEL=large \
      BENCH_IMAGE_SIZE=518 BENCH_BATCH=8 BENCH_REMAT=1 \
      python tools/trace_step.py [--steps 3] [--top 40]

Prints one JSON line per op group plus a total, sorted by time.
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_step():
    import jax
    import jax.numpy as jnp

    from dinov2_od_tpu.config import DataConfig, OptimConfig, TrainConfig, \
        detector_config_for_model_name
    from dinov2_od_tpu.data.synthetic import make_batch
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.models.detector import cast_frozen_weights
    from dinov2_od_tpu.train import create_train_state, make_optimizer, \
        make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    model = os.environ.get("BENCH_MODEL", "base")
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", "224"))

    det = detector_config_for_model_name(
        f"facebook/dinov2-{model}", hidden_dim=768, image_size=image_size
    )
    det = dataclasses.replace(
        det,
        backbone=dataclasses.replace(
            det.backbone, dtype="bfloat16",
            # Match bench.py: giant must stay scanned (a 40-block unroll
            # exceeds what the relay's remote-compile accepts).
            scan_unroll=int(
                os.environ.get(
                    "BENCH_SCAN_UNROLL", "1" if model == "giant" else "0"
                )
            ),
        ),
    )
    cfg = TrainConfig(
        detector=det,
        data=DataConfig(batch_size=batch_size, max_boxes=25),
        optim=OptimConfig(),
        use_remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    params = init_detector_params(jax.random.key(0), det)
    params = cast_frozen_weights(params, det)
    raw = make_batch(
        np.random.default_rng(0), batch_size, image_size=image_size,
        max_boxes=25,
    )
    batch = {k: jnp.asarray(v) for k, v in raw.items()}

    if os.environ.get("BENCH_MODE") == "eval":
        # Forward-only serving step, optionally int8-quantized
        # (BENCH_QUANT=int8) — mirrors bench.py eval mode.
        import jax as _jax

        from dinov2_od_tpu.models import detector_apply
        from dinov2_od_tpu.models.detector import fold_detector_lora

        eval_params = fold_detector_lora(params, det)
        if os.environ.get("BENCH_QUANT") == "int8":
            from dinov2_od_tpu.models.quantize import quantize_detector_int8

            eval_params = quantize_detector_int8(eval_params, det)
        fwd = _jax.jit(
            lambda p, im: detector_apply(p, det, im, deterministic=True)
        )

        class _EvalShim:
            """Adapts the eval forward to the (state, batch, rng) step
            interface the trace loop drives."""

            params = eval_params

        def eval_step(state, batch, rng):
            out = fwd(eval_params, batch["images"])
            return _EvalShim, out

        return eval_step, _EvalShim, batch

    tx = make_optimizer(cfg.optim, det, params)
    state = create_train_state(params, cfg.optim, det)
    step = make_train_step(cfg, tx)
    return step, state, batch


GROUPS = [
    ("gemm", re.compile(r"convolution|dot|gemm", re.I)),
    ("pallas_attn", re.compile(r"custom-call|tpu_custom_call|pallas", re.I)),
    ("transpose_copy", re.compile(r"transpose|copy|bitcast|pad|slice|concat", re.I)),
    ("dynamic_update", re.compile(r"dynamic-update|dynamic_update|scatter", re.I)),
    ("reduce", re.compile(r"reduce|all-reduce", re.I)),
    # `while` covers BOTH the matcher's solver loops and — when the
    # backbone runs scanned (scan_unroll=1, e.g. giant) — the block
    # scan itself, whose body holds the attention/FFN GEMMs. Read
    # `loop_scan_or_sort` as "time inside while loops", not "sorting".
    ("loop_scan_or_sort", re.compile(r"sort|while|condition", re.I)),
]


def classify(name: str) -> str:
    for g, rx in GROUPS:
        if rx.search(name):
            return g
    return "elementwise_other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--logdir", default="/tmp/trace_step")
    args = ap.parse_args()

    import jax

    step, state, batch = build_step()
    rng = jax.random.key(1)

    # Warm up (compile) outside the trace.
    state, _ = step(state, batch, rng)
    jax.block_until_ready(state.params)

    os.system(f"rm -rf {args.logdir}")
    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
    # Force completion through the async tunnel before closing the trace.
    print("loss:", float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0]),
          file=sys.stderr)
    jax.profiler.stop_trace()

    traces = glob.glob(
        os.path.join(args.logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not traces:
        print(json.dumps({"error": "no trace produced"}))
        return 1
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)

    # Keep only the leaf HLO-op lane: pid = TPU device, tid whose
    # thread_name is "XLA Ops" (umbrella module/step lanes would double
    # count everything).
    pid_names, tid_names = {}, {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("name") == "thread_name":
            tid_names[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if re.search(r"TPU|/device", n or "", re.I)
    }
    op_lanes = {
        k for k, n in tid_names.items()
        if k[0] in device_pids and re.search(r"XLA Ops|TensorFlow Ops", n or "")
    }

    by_name = collections.Counter()
    by_group = collections.Counter()
    total = 0.0
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if op_lanes and (ev.get("pid"), ev.get("tid")) not in op_lanes:
            continue
        name = ev.get("name", "")
        dur_ms = ev["dur"] / 1e3 / max(args.steps, 1)
        by_name[name] += dur_ms
        by_group[classify(name)] += dur_ms
        total += dur_ms
    if not op_lanes:
        print(json.dumps({"warning": "no XLA Ops lane found",
                          "lanes": {f"{k}": v for k, v in tid_names.items()}}),
              file=sys.stderr)

    print(json.dumps({"device_ms_per_step": round(total, 3),
                      "pids": {str(k): v for k, v in pid_names.items()
                               if k in device_pids}}))
    for g, ms in by_group.most_common():
        print(json.dumps({"group": g, "ms": round(ms, 3),
                          "pct": round(100 * ms / max(total, 1e-9), 1)}))
    for n, ms in by_name.most_common(args.top):
        print(json.dumps({"op": n[:80], "ms": round(ms, 4)}))
    return 0


if __name__ == "__main__":
    main()
