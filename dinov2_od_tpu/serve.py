"""HTTP detection serving endpoint.

The reference has no serving story at all — inference exists only as the
evaluation CLI (reference train.py --only_evaluate, utils.py:167-276
writing JSON to disk). This is the last mile of the serving stack built
around it here: Predictor (inference.py, live checkpoint + jit) or an AOT
StableHLO bundle (export.py, no model code at all) behind a JSON API.

    python -m dinov2_od_tpu.serve --checkpoint outputs/checkpoint_epoch_49 \
        --model_name facebook/dinov2-base --port 8000
    # or, from an exported bundle (no recompilation, pinned program):
    python -m dinov2_od_tpu.serve --bundle outputs/bundle --port 8000

API:
    GET  /healthz  -> {"status": "ok", "backend": ..., "model": ...}
    GET  /metrics  -> Prometheus text format (requests, errors, images,
                      latency sum/count)
    POST /detect   body {"images": [<base64 JPEG/PNG bytes>, ...],
                         "score_threshold": 0.5}
                   -> {"detections": [[{bbox, score, category_id,
                       name?}, ...] per image], "latency_ms": float}

On SIGTERM the server drains: in-flight requests complete, the accept
loop stops, and the process exits 0 (same eviction contract as the
trainer's preemption guard, train/preemption.py).

Design notes (TPU serving):
- stdlib-only (`http.server.ThreadingHTTPServer`): request decode runs in
  handler threads; device dispatch goes through DynamicBatcher (default),
  which coalesces concurrent requests into shared dense device batches —
  a fleet of b1 clients runs the device at up to --max_batch. With
  --no_dynamic_batching a lock serializes whole-request Predictor.detect
  calls instead. Predictor itself double-buffers chunks so the D2H link
  and compute overlap within a call.
- Cold-start: pass --compilation_cache to deserialize the compiled
  program instead of re-running XLA (~20-40s for ViT-B on remote-attached
  TPUs), or serve a bundle, which never compiles.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _decode_image(b64: str) -> np.ndarray:
    """base64 image bytes -> [H, W, 3] float32 in [0, 1]."""
    from PIL import Image

    raw = base64.b64decode(b64, validate=True)
    with Image.open(io.BytesIO(raw)) as pil:
        return np.asarray(pil.convert("RGB"), np.float32) / 255.0


class _Metrics:
    """Thread-safe monotonic counters, rendered in Prometheus text
    exposition format."""

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.errors = 0
        self.images = 0
        self.latency_sum_s = 0.0

    def record(self, images: int = 0, latency_s: float = 0.0,
               error: bool = False) -> None:
        with self._lock:
            self.requests += 1
            self.errors += error
            self.images += images
            self.latency_sum_s += latency_s

    def render(self) -> str:
        with self._lock:
            return (
                "# TYPE serving_requests_total counter\n"
                f"serving_requests_total {self.requests}\n"
                "# TYPE serving_errors_total counter\n"
                f"serving_errors_total {self.errors}\n"
                "# TYPE serving_images_total counter\n"
                f"serving_images_total {self.images}\n"
                "# TYPE serving_latency_seconds summary\n"
                f"serving_latency_seconds_sum {self.latency_sum_s:.6f}\n"
                f"serving_latency_seconds_count {self.requests}\n"
            )


class DynamicBatcher:
    """Cross-request dynamic batching.

    The per-request path (`device_lock` + `model.detect`) keeps batches
    dense *within* a request but serializes requests, so a fleet of b1
    clients runs the device at b1. This coalesces concurrent requests
    into one `detect` call: handler threads `submit()` and block; a
    single dispatcher thread drains the queue, waits up to
    `max_wait_ms` for more work while the batch is below `max_batch`
    images, issues ONE device call, and fans results back out.

    Per-request score thresholds cost nothing to honor: the device call
    runs at the *minimum* threshold in the window and each request's
    detections are re-filtered host-side (scores are already in the
    result dicts). Request order within a batch is preserved per image.

    The solo-request latency tax is `max_wait_ms` (default 5 ms, vs a
    ~40 ms model call) — the dispatcher stops waiting early once
    `max_batch` images are queued.
    """

    _STOP = object()

    def __init__(self, model, max_batch: int = 32,
                 max_wait_ms: float = 5.0):
        import queue

        self.model = model
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        self.batches = 0          # device calls issued (for /metrics)
        self.batched_images = 0   # images through those calls

    def submit(self, images, score_threshold: float):
        """Block until this request's results are ready (or raise the
        device call's exception)."""
        done = threading.Event()
        item = {
            "images": images,
            "threshold": float(score_threshold),
            "done": done,
            "result": None,
            "error": None,
        }
        self._queue.put(item)
        done.wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def close(self):
        self._queue.put(self._STOP)
        self._thread.join(timeout=30)

    def _collect(self):
        """One batching window: block for the first item, then drain
        until max_batch images or max_wait_ms, whichever first."""
        import queue

        first = self._queue.get()
        if first is self._STOP:
            return None
        batch = [first]
        n = len(first["images"])
        deadline = time.monotonic() + self.max_wait_s
        while n < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if item is self._STOP:
                self._queue.put(self._STOP)  # re-raise for the loop
                break
            batch.append(item)
            n += len(item["images"])
        return batch

    def _run(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            images = [im for item in batch for im in item["images"]]
            threshold = min(item["threshold"] for item in batch)
            try:
                results = self.model.detect(
                    images, score_threshold=threshold
                )
            except Exception as e:  # fan the failure out to all waiters
                for item in batch:
                    item["error"] = e
                    item["done"].set()
                continue
            self.batches += 1
            self.batched_images += len(images)
            pos = 0
            for item in batch:
                k = len(item["images"])
                per_image = results[pos : pos + k]
                pos += k
                thr = item["threshold"]
                if thr > threshold:  # re-filter at the request's own bar
                    per_image = [
                        [d for d in dets if d["score"] >= thr]
                        for dets in per_image
                    ]
                item["result"] = per_image
                item["done"].set()


class _Handler(BaseHTTPRequestHandler):
    # Injected by make_server via subclassing.
    model = None
    model_info: dict = {}
    device_lock: threading.Lock = threading.Lock()
    metrics: _Metrics = _Metrics()
    batcher: Optional[DynamicBatcher] = None

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logger.info("%s %s", self.address_string(), fmt % args)

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/metrics":
            text = self.metrics.render()
            if self.batcher is not None:
                text += (
                    "# TYPE serving_device_batches_total counter\n"
                    f"serving_device_batches_total {self.batcher.batches}\n"
                    "# TYPE serving_device_batched_images_total counter\n"
                    "serving_device_batched_images_total "
                    f"{self.batcher.batched_images}\n"
                )
            body = text.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        if self.path != "/healthz":
            return self._reply(404, {"error": "unknown path"})
        self._reply(200, {"status": "ok", **self.model_info})

    def do_POST(self):
        if self.path != "/detect":
            return self._reply(404, {"error": "unknown path"})
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            b64s = req["images"]
            if not isinstance(b64s, list) or not b64s:
                raise ValueError("'images' must be a non-empty list")
            images = [_decode_image(b) for b in b64s]
            threshold = float(req.get("score_threshold", 0.5))
        except Exception as e:  # malformed request
            self.metrics.record(error=True)
            return self._reply(400, {"error": f"bad request: {e}"})
        try:
            t0 = time.perf_counter()
            if self.batcher is not None:
                detections = self.batcher.submit(images, threshold)
            else:
                with self.device_lock:
                    detections = self.model.detect(
                        images, score_threshold=threshold
                    )
            latency_s = time.perf_counter() - t0
        except Exception as e:
            logger.exception("detect failed")
            self.metrics.record(error=True)
            return self._reply(500, {"error": f"inference failed: {e}"})
        self.metrics.record(images=len(images), latency_s=latency_s)
        self._reply(
            200, {"detections": detections, "latency_ms": latency_s * 1e3}
        )


def make_server(model, host: str = "127.0.0.1", port: int = 8000,
                model_info: Optional[dict] = None,
                batcher: Optional[DynamicBatcher] = None,
                ) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server around any object with a
    `.detect(images, score_threshold=...)` method — Predictor or
    export.ServingModel. Tests call this with port=0 and drive
    `serve_forever` on a thread. With `batcher`, concurrent requests
    are coalesced into shared device batches (DynamicBatcher)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "model": model,
            "model_info": dict(model_info or {}),
            "device_lock": threading.Lock(),
            "metrics": _Metrics(),
            "batcher": batcher,
        },
    )
    return ThreadingHTTPServer((host, port), handler)


def install_drain_handler(server: ThreadingHTTPServer) -> None:
    """SIGTERM -> graceful drain: stop accepting, let in-flight handler
    threads finish, make serve_forever return. Same eviction contract as
    training's PreemptionGuard."""
    import signal

    def _drain(signum, frame):
        logger.info("signal %d: draining, shutting down", signum)
        # shutdown() blocks until the serve loop exits — do it off the
        # signal-handling (main) thread.
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="Orbax checkpoint directory")
    src.add_argument("--bundle", help="AOT serving bundle (export.py)")
    p.add_argument("--model_name", default="facebook/dinov2-base")
    p.add_argument("--num_classes", type=int, default=91)
    p.add_argument("--lightweight", action="store_true",
                   help="checkpoint was trained with the train CLI's "
                        "--lightweight config")
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--quantize", default=None, choices=[None, "int8"],
                   help="int8 W8A8 serving path (checkpoint mode)")
    p.add_argument("--compilation_cache", default="",
                   help="persistent XLA cache dir (skips cold compile)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_dynamic_batching", action="store_true",
                   help="serialize requests instead of coalescing "
                        "concurrent ones into shared device batches")
    p.add_argument("--max_batch", type=int, default=32,
                   help="dynamic batching: max images per device call "
                        "(b32 is the measured v5e serving sweet spot)")
    p.add_argument("--batch_wait_ms", type=float, default=5.0,
                   help="dynamic batching: max time to wait for "
                        "more requests before dispatching")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    if args.bundle:
        from .export import load_serving_bundle

        model = load_serving_bundle(args.bundle)
        info = {"model": "bundle:" + args.bundle}
    else:
        from .inference import Predictor

        if args.lightweight:
            from .config import lightweight_detector_config

            det_cfg = lightweight_detector_config(
                num_classes=args.num_classes, image_size=args.image_size
            )
        else:
            from .config import detector_config_for_model_name

            det_cfg = detector_config_for_model_name(
                args.model_name,
                num_classes=args.num_classes,
                image_size=args.image_size,
            )
        model = Predictor.from_checkpoint(
            args.checkpoint,
            model_name=args.model_name,
            num_classes=args.num_classes,
            detector_cfg=det_cfg,
            batch_size=args.batch_size,
            quantize=args.quantize,
            compilation_cache=args.compilation_cache or None,
        )
        info = {"model": args.model_name, "quantize": args.quantize or "no"}
    import jax

    info["backend"] = jax.default_backend()

    # Warm the compiled path before accepting traffic (first request
    # otherwise pays the jit compile).
    size = getattr(model, "image_size", None) or model.cfg.backbone.image_size
    model.detect([np.zeros((size, size, 3), np.float32)], score_threshold=1.0)

    batcher = None
    if not args.no_dynamic_batching:
        batcher = DynamicBatcher(
            model, max_batch=args.max_batch,
            max_wait_ms=args.batch_wait_ms,
        )
    server = make_server(model, args.host, args.port, info, batcher=batcher)
    install_drain_handler(server)
    logger.info("serving on %s:%d", args.host, server.server_address[1])
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        if batcher is not None:
            batcher.close()
    logger.info("server drained and closed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
