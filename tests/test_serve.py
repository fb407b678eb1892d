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
