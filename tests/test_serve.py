"""HTTP serving endpoint (serve.py) — the reference has no serving
surface at all (inference exists only as train.py --only_evaluate)."""

import base64
import io
import json
import threading
import urllib.request
import urllib.error

import jax
import numpy as np
import pytest

from dinov2_od_tpu.config import BackboneConfig, DecoderConfig, DetectorConfig
from dinov2_od_tpu.inference import Predictor
from dinov2_od_tpu.models import init_detector_params
from dinov2_od_tpu.serve import make_server


def _cfg():
    return DetectorConfig(
        backbone=BackboneConfig(variant="small", image_size=56, lora_r=1,
                                target_dim=32, depth_override=2),
        decoder=DecoderConfig(hidden_dim=32, num_queries=5, num_layers=1,
                              num_heads=4, dim_feedforward=64, num_classes=6),
    )


def _png_b64(rng, size=48):
    from PIL import Image

    arr = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


@pytest.fixture(scope="module")
def server():
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg)
    model = Predictor(params, cfg, batch_size=2)
    srv = make_server(model, "127.0.0.1", 0, {"model": "tiny"})
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"
    assert body["model"] == "tiny"


def test_detect_endpoint(server):
    rng = np.random.default_rng(0)
    status, body = _post(
        server + "/detect",
        {"images": [_png_b64(rng), _png_b64(rng), _png_b64(rng)],
         "score_threshold": 0.0},
    )
    assert status == 200
    dets = body["detections"]
    assert len(dets) == 3 and body["latency_ms"] > 0
    for per_image in dets:
        for d in per_image:
            assert set(d) >= {"bbox", "score", "category_id"}
            assert len(d["bbox"]) == 4


def test_detect_threshold_filters(server):
    rng = np.random.default_rng(1)
    _, lo = _post(server + "/detect",
                  {"images": [_png_b64(rng)], "score_threshold": 0.0})
    _, hi = _post(server + "/detect",
                  {"images": [_png_b64(rng)], "score_threshold": 1.0})
    assert sum(len(d) for d in hi["detections"]) <= sum(
        len(d) for d in lo["detections"]
    )


def test_bad_requests(server):
    for payload in ({}, {"images": []}, {"images": "nope"},
                    {"images": ["!!!not-base64!!!"]}):
        try:
            status, body = _post(server + "/detect", payload)
        except urllib.error.HTTPError as e:
            status, body = e.code, json.loads(e.read())
        assert status == 400 and "error" in body
    try:
        with urllib.request.urlopen(server + "/nope", timeout=30) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_concurrent_requests(server):
    rng = np.random.default_rng(2)
    payload = {"images": [_png_b64(rng)], "score_threshold": 0.0}
    results = []

    def worker():
        results.append(_post(server + "/detect", payload)[0])

    threads = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert results == [200] * 4


def test_metrics_endpoint(server):
    def scrape():
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            return {
                line.split()[0]: float(line.split()[1])
                for line in r.read().decode().splitlines()
                if line and not line.startswith("#")
            }

    before = scrape()
    rng = np.random.default_rng(3)
    _post(server + "/detect",
          {"images": [_png_b64(rng), _png_b64(rng)], "score_threshold": 0.5})
    try:
        _post(server + "/detect", {"images": "bad"})
    except urllib.error.HTTPError:
        pass
    after = scrape()
    assert after["serving_requests_total"] - before["serving_requests_total"] == 2
    assert after["serving_images_total"] - before["serving_images_total"] == 2
    assert after["serving_errors_total"] - before["serving_errors_total"] == 1
    assert after["serving_latency_seconds_sum"] > before["serving_latency_seconds_sum"]


def test_sigterm_drains_server():
    import signal

    from dinov2_od_tpu.serve import install_drain_handler, make_server as mk

    class _Dummy:
        def detect(self, images, score_threshold=0.5):
            return [[] for _ in images]

    srv = mk(_Dummy(), "127.0.0.1", 0)
    before = signal.getsignal(signal.SIGTERM)
    install_drain_handler(srv)
    t = threading.Thread(target=srv.serve_forever)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.server_address[1]}/healthz", timeout=30
        ) as r:
            assert r.status == 200
        signal.raise_signal(signal.SIGTERM)
        t.join(timeout=30)
        assert not t.is_alive()  # serve_forever returned: drained
    finally:
        srv.server_close()
        signal.signal(signal.SIGTERM, before)


# ---- dynamic batching (DynamicBatcher) ------------------------------------


class _CountingModel:
    """Fake model: returns one detection per image whose score encodes
    the image's position in the device batch; records call sizes."""

    def __init__(self, block_s=0.0, scores=None):
        self.calls = []
        self.block_s = block_s
        self.scores = scores  # optional fixed per-detection scores

    def detect(self, images, score_threshold=0.5):
        import time as _time

        self.calls.append(len(images))
        if self.block_s:
            _time.sleep(self.block_s)
        out = []
        for i, _ in enumerate(images):
            scores = self.scores if self.scores is not None else [0.9]
            out.append([
                {"bbox": [0, 0, 1, 1], "score": s, "category_id": 1}
                for s in scores
                if s >= score_threshold
            ])
        return out


def test_batcher_coalesces_concurrent_requests():
    from dinov2_od_tpu.serve import DynamicBatcher

    model = _CountingModel(block_s=0.05)
    b = DynamicBatcher(model, max_batch=16, max_wait_ms=100.0)
    try:
        results = [None] * 8

        def worker(i):
            results[i] = b.submit([np.zeros((4, 4, 3))], 0.5)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        assert all(r is not None and len(r) == 1 for r in results)
        # 8 one-image requests fired together must share device calls:
        # strictly fewer calls than requests, images conserved.
        assert len(model.calls) < 8
        assert sum(model.calls) == 8
        assert b.batches == len(model.calls)
        assert b.batched_images == 8
    finally:
        b.close()


def test_batcher_per_request_thresholds():
    from dinov2_od_tpu.serve import DynamicBatcher

    model = _CountingModel(block_s=0.05, scores=[0.9, 0.6, 0.3])
    b = DynamicBatcher(model, max_batch=16, max_wait_ms=200.0)
    try:
        out = {}

        def worker(name, thr):
            out[name] = b.submit([np.zeros((4, 4, 3))], thr)

        threads = [
            threading.Thread(target=worker, args=("lo", 0.2)),
            threading.Thread(target=worker, args=("hi", 0.8)),
        ]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        # Coalesced call ran at min(0.2, 0.8); each request re-filtered.
        assert [d["score"] for d in out["lo"][0]] == [0.9, 0.6, 0.3]
        assert [d["score"] for d in out["hi"][0]] == [0.9]
    finally:
        b.close()


def test_batcher_order_and_multi_image_requests():
    from dinov2_od_tpu.serve import DynamicBatcher

    class _EchoModel:
        def detect(self, images, score_threshold=0.5):
            return [
                [{"bbox": [0, 0, 1, 1], "score": 0.9,
                  "category_id": int(im[0, 0, 0])}]
                for im in images
            ]

    b = DynamicBatcher(_EchoModel(), max_batch=8, max_wait_ms=100.0)
    try:
        out = {}

        def worker(name, tags):
            imgs = [np.full((2, 2, 3), t, np.float32) for t in tags]
            out[name] = b.submit(imgs, 0.0)

        threads = [
            threading.Thread(target=worker, args=("a", [1, 2, 3])),
            threading.Thread(target=worker, args=("b", [7, 8])),
        ]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        assert [d[0]["category_id"] for d in out["a"]] == [1, 2, 3]
        assert [d[0]["category_id"] for d in out["b"]] == [7, 8]
    finally:
        b.close()


def test_batcher_propagates_errors_to_all_waiters():
    from dinov2_od_tpu.serve import DynamicBatcher

    class _BoomModel:
        def detect(self, images, score_threshold=0.5):
            raise RuntimeError("boom")

    b = DynamicBatcher(_BoomModel(), max_batch=8, max_wait_ms=50.0)
    try:
        errors = []

        def worker():
            try:
                b.submit([np.zeros((2, 2, 3))], 0.5)
            except RuntimeError as e:
                errors.append(str(e))

        threads = [threading.Thread(target=worker) for _ in range(3)]
        [t.start() for t in threads]
        [t.join(timeout=30) for t in threads]
        assert errors == ["boom"] * 3
    finally:
        b.close()


def test_server_with_batcher_end_to_end():
    from dinov2_od_tpu.serve import DynamicBatcher, make_server as mk

    cfg = _cfg()
    params = init_detector_params(jax.random.key(1), cfg)
    model = Predictor(params, cfg, batch_size=4)
    batcher = DynamicBatcher(model, max_batch=8, max_wait_ms=20.0)
    srv = mk(model, "127.0.0.1", 0, {"model": "tiny"}, batcher=batcher)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(5)
        payload = {"images": [_png_b64(rng)], "score_threshold": 0.0}
        statuses = []

        def worker():
            statuses.append(_post(url + "/detect", payload)[0])

        threads = [threading.Thread(target=worker) for _ in range(4)]
        [t2.start() for t2 in threads]
        [t2.join(timeout=120) for t2 in threads]
        assert statuses == [200] * 4
        with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
            text = r.read().decode()
        metrics = {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines()
            if line and not line.startswith("#")
        }
        assert metrics["serving_device_batched_images_total"] == 4
        assert 1 <= metrics["serving_device_batches_total"] <= 4
    finally:
        srv.shutdown()
        srv.server_close()
        batcher.close()
