"""Data pipeline tests: COCO parsing semantics, loader behavior,
post-processing."""

import json

import numpy as np
import pytest

from dinov2_od_tpu.data.coco import (
    CocoDetectionDataset,
    CocoTestDataset,
    IMAGENET_MEAN,
)
from dinov2_od_tpu.data.loader import DataLoader, pad_batch
from dinov2_od_tpu.data.synthetic import write_coco_dataset
from dinov2_od_tpu.evaluation.postprocess import postprocess_detections


@pytest.fixture(scope="module")
def coco_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("coco")
    images_dir, ann_file = write_coco_dataset(str(out), num_images=10, seed=1)
    return images_dir, ann_file


def test_dataset_parsing(coco_fixture):
    images_dir, ann_file = coco_fixture
    ds = CocoDetectionDataset(images_dir, ann_file, image_size=64, max_boxes=8)
    assert len(ds) == 10
    # Non-contiguous category ids (10, 20, ...) remapped by enumeration.
    assert ds.cat_id_to_label == {10 * (i + 1): i for i in range(6)}
    ex = ds.get_example(0)
    assert ex["images"].shape == (64, 64, 3)
    assert ex["boxes"].shape == (8, 4)
    assert ex["valid"].sum() >= 1
    # Valid boxes are normalized cxcywh.
    v = ex["boxes"][ex["valid"]]
    assert (v > 0).all() and (v < 1).all()
    # Labels in contiguous range.
    assert (ex["labels"][ex["valid"]] < 6).all()


def test_dataset_box_filtering(tmp_path):
    """Degenerate, tiny, crowd, and out-of-range boxes are dropped
    (reference dataset.py:75-91)."""
    images_dir = tmp_path / "images"
    images_dir.mkdir()
    from PIL import Image

    Image.new("RGB", (100, 100)).save(images_dir / "000000000001.png")
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 1, "bbox": [10, 10, 0, 20], "iscrowd": 0},   # w=0
        {"id": 3, "image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20], "iscrowd": 1},  # crowd
        {"id": 4, "image_id": 1, "category_id": 1, "bbox": [10, 10, 0.05, 20], "iscrowd": 0}, # tiny
    ]
    gt = {
        "images": [{"id": 1, "file_name": "000000000001.png", "width": 100, "height": 100}],
        "annotations": anns,
        "categories": [{"id": 1, "name": "x"}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(gt))
    ds = CocoDetectionDataset(str(images_dir), str(ann_file), image_size=32, max_boxes=4)
    ex = ds.get_example(0)
    assert ex["valid"].sum() == 1
    np.testing.assert_allclose(ex["boxes"][0], [0.2, 0.2, 0.2, 0.2], atol=1e-6)


def test_normalization_toggle(coco_fixture):
    images_dir, ann_file = coco_fixture
    raw = CocoDetectionDataset(images_dir, ann_file, image_size=32, normalize=False)
    norm = CocoDetectionDataset(images_dir, ann_file, image_size=32, normalize=True)
    a = raw.get_example(0)["images"]
    b = norm.get_example(0)["images"]
    np.testing.assert_allclose(
        b, (a - IMAGENET_MEAN) / np.array([0.229, 0.224, 0.225], np.float32),
        atol=1e-6,
    )
    assert 0 <= a.min() and a.max() <= 1


def test_loader_batching_and_shuffle(coco_fixture):
    images_dir, ann_file = coco_fixture
    ds = CocoDetectionDataset(images_dir, ann_file, image_size=32, max_boxes=8)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1, drop_last=True, num_workers=2)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["images"].shape == (4, 32, 32, 3)
    ids_e0 = np.concatenate([b["image_id"] for b in batches])
    # Same epoch -> same order; different epoch -> different order.
    ids_e0_again = np.concatenate([b["image_id"] for b in dl])
    np.testing.assert_array_equal(ids_e0, ids_e0_again)
    dl.set_epoch(1)
    ids_e1 = np.concatenate([b["image_id"] for b in dl])
    assert not np.array_equal(ids_e0, ids_e1)


def test_loader_partial_batch_and_pad(coco_fixture):
    images_dir, ann_file = coco_fixture
    ds = CocoDetectionDataset(images_dir, ann_file, image_size=32, max_boxes=8)
    dl = DataLoader(ds, batch_size=4, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3 and len(batches[-1]["images"]) == 2
    padded = pad_batch(batches[-1], 4)
    assert padded["images"].shape[0] == 4
    assert padded["valid"][2:].sum() == 0


def test_test_dataset_annotation_free(coco_fixture, tmp_path):
    images_dir, _ = coco_fixture
    ds = CocoTestDataset(images_dir, annotation_file=None, image_size=32)
    assert len(ds) == 10
    ex = ds.get_example(0)
    assert ex["images"].shape == (32, 32, 3)
    assert int(ex["image_id"]) == 1  # from filename stem
    np.testing.assert_array_equal(ex["orig_size"], [224, 224])


def test_postprocess_rescale_and_category_map():
    # One query strongly predicting class 2 with a known box.
    logits = np.full((1, 3, 4), -10.0, np.float32)
    logits[0, 0, 2] = 10.0
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [0.5, 0.5, 0.2, 0.4]
    res = postprocess_detections(
        logits, boxes, image_ids=[77], orig_sizes=[[480, 640]],
        label_to_cat_id={0: 10, 1: 20, 2: 30, 3: 40},
    )
    top = res[0]
    assert top["image_id"] == 77 and top["category_id"] == 30
    # cxcywh (0.5,0.5,0.2,0.4) @ 640x480 -> xywh (256, 144, 128, 192).
    np.testing.assert_allclose(top["bbox"], [256, 144, 128, 192], atol=1e-3)
    assert top["score"] > 0.99
    # Low-scoring (sigmoid(-10)) detections fall under the 0.05 threshold.
    assert all(r["score"] > 0.05 for r in res)


def test_postprocess_parity_mode():
    logits = np.full((1, 2, 3), -10.0, np.float32)
    logits[0, 0, 0] = 10.0  # class 0 — skipped in parity mode
    logits[0, 1, 1] = 10.0
    boxes = np.tile(np.array([0.5, 0.5, 0.2, 0.2], np.float32), (1, 2, 1))
    res = parity = postprocess_detections(
        logits, boxes, image_ids=[1], orig_sizes=[[100, 100]],
        label_to_cat_id={}, parity_mode=True,
    )
    assert all(r["category_id"] != 0 for r in parity)
    # Parity mode: boxes stay normalized (reference bug, utils.py:226).
    assert all(max(r["bbox"]) <= 1.0 for r in parity)


def test_uint8_feed_matches_float_path(coco_fixture):
    """uint8 feed + in-jit prep_images == float32 host preprocessing:
    the deferred /255 + normalize must produce the same tensors."""
    import jax.numpy as jnp

    from dinov2_od_tpu.train.step import prep_images

    images_dir, ann_file = coco_fixture
    f32 = CocoDetectionDataset(
        images_dir, ann_file, image_size=32, normalize=True,
        decode_backend="pil",
    )
    u8 = CocoDetectionDataset(
        images_dir, ann_file, image_size=32, normalize=True,
        output_dtype="uint8", decode_backend="pil",
    )
    a = f32.get_example(0)["images"]
    raw = u8.get_example(0)["images"]
    assert raw.dtype == np.uint8
    b = prep_images(jnp.asarray(raw), normalize=True)
    np.testing.assert_allclose(np.asarray(b), a, atol=1e-6)
    # normalize=False -> /255 only (reference ToTensor semantics).
    c = prep_images(jnp.asarray(raw), normalize=False)
    np.testing.assert_allclose(np.asarray(c), raw.astype(np.float32) / 255.0)
    # Float inputs pass through untouched (already preprocessed).
    d = prep_images(jnp.asarray(a), normalize=True)
    np.testing.assert_array_equal(np.asarray(d), a)


def test_decode_backend_auto_close_to_pil(coco_fixture):
    """The fast (cv2 scaled-decode) backend stays at resampling-kernel
    distance from the exact PIL reference decode."""
    images_dir, ann_file = coco_fixture
    pil = CocoDetectionDataset(
        images_dir, ann_file, image_size=64, normalize=False,
        output_dtype="uint8", decode_backend="pil",
    )
    fast = CocoDetectionDataset(
        images_dir, ann_file, image_size=64, normalize=False,
        output_dtype="uint8", decode_backend="auto",
    )
    a = pil.get_example(0)["images"].astype(np.int16)
    b = fast.get_example(0)["images"].astype(np.int16)
    assert b.shape == a.shape
    assert np.abs(a - b).mean() < 20  # resampling-level, not structural


def test_device_prefetch_preserves_order_and_keys(coco_fixture):
    import jax

    from dinov2_od_tpu.data.loader import device_prefetch

    images_dir, ann_file = coco_fixture
    ds = CocoDetectionDataset(images_dir, ann_file, image_size=32, max_boxes=8)
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False)
    direct = list(loader)

    def _tag(batch):
        batch["_n"] = len(batch["images"])
        return batch

    got = list(
        device_prefetch(
            iter(DataLoader(ds, 4, shuffle=False, drop_last=False)),
            None, size=2, device_keys=("images",), transform=_tag,
        )
    )
    assert len(got) == len(direct)
    for g, d in zip(got, direct):
        assert isinstance(g["images"], jax.Array)
        assert isinstance(g["image_id"], np.ndarray)  # host key untouched
        assert g["_n"] == len(d["images"])
        np.testing.assert_array_equal(np.asarray(g["images"]), d["images"])
        np.testing.assert_array_equal(g["labels"], d["labels"])


def test_device_prefetch_propagates_errors():
    from dinov2_od_tpu.data.loader import device_prefetch

    def bad_iter():
        yield {"x": np.zeros(3)}
        raise RuntimeError("decode failed")

    it = device_prefetch(bad_iter(), None, size=1)
    next(it)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_async_evaluate_dataset_matches_sync_reference(coco_fixture):
    """The double-buffered evaluate_dataset (fused device-side top-k,
    compact readback) must produce exactly the results of a plain
    synchronous loop through the legacy full-logits postprocess (order
    included) — the async overlap and the top-k fusion are pure
    scheduling/placement changes."""
    import jax.numpy as jnp

    from dinov2_od_tpu.evaluation.postprocess import select_topk_detections
    from dinov2_od_tpu.train.loop import evaluate_dataset

    images_dir, ann_file = coco_fixture
    ds = CocoDetectionDataset(
        images_dir, ann_file, image_size=32, max_boxes=8, normalize=False
    )
    q, c = 5, len(ds.cat_id_to_label) + 1

    def fake_eval_step(params, images):
        # Deterministic predictions derived from the batch content.
        m = jnp.mean(images, axis=(1, 2, 3), keepdims=False)
        logits = jnp.tile(m[:, None, None], (1, q, c)) * jnp.arange(
            1, c + 1, dtype=jnp.float32
        )
        boxes = jnp.tile(
            jnp.asarray([[0.5, 0.5, 0.2, 0.2]], jnp.float32), (images.shape[0], q, 1)
        )
        return {"pred_logits": logits, "pred_boxes": boxes}

    def fake_topk_step(params, images, orig_sizes):
        out = fake_eval_step(params, images)
        scores, labels, boxes = select_topk_detections(
            out["pred_logits"], out["pred_boxes"], orig_sizes
        )
        return {
            "topk": jnp.concatenate(
                [
                    scores[..., None].astype(jnp.float32),
                    labels[..., None].astype(jnp.float32),
                    boxes.astype(jnp.float32),
                ],
                axis=-1,
            )
        }

    got = evaluate_dataset(
        fake_topk_step, None, ds, batch_size=4, label_to_cat_id=ds.label_to_cat_id
    )

    # Plain synchronous reference.
    expected = []
    loader = DataLoader(ds, 4, shuffle=False, drop_last=False)
    for batch in loader:
        n = len(batch["images"])
        batch = pad_batch(batch, 4)
        out = fake_eval_step(None, np.asarray(batch["images"]))
        expected.extend(
            postprocess_detections(
                np.asarray(out["pred_logits"])[:n],
                np.asarray(out["pred_boxes"])[:n],
                batch["image_id"][:n],
                batch["orig_size"][:n],
                ds.label_to_cat_id,
            )
        )
    assert got == expected
