"""End-to-end HTTP serving latency/throughput (serve.py).

Measures what a client actually sees — JSON + base64 decode, device
dispatch, device->host readback, JSON response — not just the in-jit
forward (bench.py BENCH_MODE=eval measures that). Run on the TPU host:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_serving.py \
        [--model base] [--image_size 224] [--requests 50] [--threads 4] \
        [--quantize int8]

Prints one JSON line: p50/p95/p99 single-stream latency (ms) and
concurrent throughput (img/s). On this machine the TPU sits behind a
~30ms-RTT relay, which is the latency floor; on a local chip the floor is
the PCIe/ICI dispatch (~0.5ms int8 b1, BENCH.md).
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
import urllib.request

import numpy as np


def _b64_image(size: int) -> str:
    from PIL import Image

    arr = (np.random.default_rng(0).uniform(size=(size, size, 3)) * 255).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    return base64.b64encode(buf.getvalue()).decode()


def _post(url: str, payload: bytes) -> float:
    t0 = time.perf_counter()
    req = urllib.request.Request(
        url, payload, {"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        json.loads(r.read())
    return (time.perf_counter() - t0) * 1e3


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="base")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--requests", type=int, default=50)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--quantize", default=None, choices=[None, "int8"])
    p.add_argument("--checkpoint", default=None,
                   help="serve trained weights; default random init")
    args = p.parse_args()

    from dinov2_od_tpu.config import detector_config_for_model_name
    from dinov2_od_tpu.inference import Predictor
    from dinov2_od_tpu.models import init_detector_params
    from dinov2_od_tpu.serve import make_server

    import jax

    cfg = detector_config_for_model_name(
        f"facebook/dinov2-{args.model}", image_size=args.image_size
    )
    if args.checkpoint:
        model = Predictor.from_checkpoint(
            args.checkpoint, detector_cfg=cfg, batch_size=1,
            quantize=args.quantize,
        )
    else:
        params = init_detector_params(jax.random.key(0), cfg)
        model = Predictor(params, cfg, batch_size=1, quantize=args.quantize)
    # Warm (compile) before timing.
    model.detect(
        [np.zeros((args.image_size, args.image_size, 3), np.float32)],
        score_threshold=1.0,
    )
    srv = make_server(model, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/detect"
    payload = json.dumps(
        {"images": [_b64_image(args.image_size)], "score_threshold": 0.5}
    ).encode()

    _post(url, payload)  # one warm HTTP round
    lat = sorted(_post(url, payload) for _ in range(args.requests))
    q = lambda f: lat[min(len(lat) - 1, int(f * len(lat)))]

    # Concurrent phase: device dispatch serializes behind the server's
    # lock; this measures sustained img/s with request decode overlapped.
    done = []
    def worker(n):
        for _ in range(n):
            _post(url, payload)
            done.append(1)
    per = max(1, args.requests // args.threads)
    ts = [threading.Thread(target=worker, args=(per,)) for _ in range(args.threads)]
    t0 = time.perf_counter()
    [t.start() for t in ts]
    [t.join() for t in ts]
    dt = time.perf_counter() - t0
    srv.shutdown(); srv.server_close()

    print(json.dumps({
        "metric": f"HTTP serving b1 ViT-{args.model[0].upper()}"
                  f"/{args.image_size}"
                  + (f" {args.quantize}" if args.quantize else " bf16-eval"),
        "p50_ms": round(q(0.50), 2),
        "p95_ms": round(q(0.95), 2),
        "p99_ms": round(q(0.99), 2),
        "concurrent_img_per_s": round(len(done) / dt, 2),
        "requests": args.requests,
        "threads": args.threads,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
