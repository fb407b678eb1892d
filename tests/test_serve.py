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
