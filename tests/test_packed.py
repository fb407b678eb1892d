"""Packed-dataset tests: pack/replay equality vs the decoding dataset,
loader fast path, CLI integration, and format guards."""

import numpy as np
import pytest

from dinov2_od_tpu.data.coco import CocoDetectionDataset
from dinov2_od_tpu.data.loader import DataLoader
from dinov2_od_tpu.data.packed import PackedDataset, pack_dataset
from dinov2_od_tpu.data.synthetic import write_coco_dataset


@pytest.fixture(scope="module")
def packed_fixture(tmp_path_factory):
    out = tmp_path_factory.mktemp("packsrc")
    images_dir, ann_file = write_coco_dataset(
        str(out), num_images=12, seed=3, fmt="jpg"
    )
    src = CocoDetectionDataset(
        images_dir, ann_file, image_size=56, max_boxes=8,
        output_dtype="uint8",
    )
    packed_dir = str(tmp_path_factory.mktemp("packed"))
    pack_dataset(src, packed_dir, num_workers=2)
    return src, packed_dir


def test_pack_replay_equality(packed_fixture):
    """Every field of every example survives the pack round trip
    bit-identically (uint8 pixels, padded boxes/labels/valid, ids)."""
    src, packed_dir = packed_fixture
    ds = PackedDataset(packed_dir)
    assert len(ds) == len(src)
    assert ds.label_to_cat_id == src.label_to_cat_id
    assert ds.num_classes == src.num_classes
    assert ds.coco_path == src.coco_path
    for i in range(len(src)):
        a, b = src.get_example(i), ds.get_example(i)
        for k in ("images", "boxes", "labels", "valid", "orig_size"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{k}[{i}]")
        assert a["image_id"] == b["image_id"]


def test_get_batch_matches_stacked_examples(packed_fixture):
    _, packed_dir = packed_fixture
    ds = PackedDataset(packed_dir)
    idxs = [3, 0, 7, 7]
    batch = ds.get_batch(idxs)
    for k in batch:
        want = np.stack([ds.get_example(i)[k] for i in idxs])
        np.testing.assert_array_equal(batch[k], want, err_msg=k)


def test_loader_uses_fast_path_and_matches_source(packed_fixture):
    """DataLoader over the packed dataset yields the same batches (same
    shuffle seed/epoch) as over the decoding dataset."""
    src, packed_dir = packed_fixture
    ds = PackedDataset(packed_dir)
    la = DataLoader(src, 4, shuffle=True, seed=11, drop_last=True)
    lb = DataLoader(ds, 4, shuffle=True, seed=11, drop_last=True)
    la.set_epoch(2)
    lb.set_epoch(2)
    for a, b in zip(la, lb):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_indices_subset_and_float_output(packed_fixture):
    src, packed_dir = packed_fixture
    ds = PackedDataset(packed_dir, indices=[5, 1], output_dtype="float32")
    assert len(ds) == 2
    ex = ds.get_example(0)
    # Float path normalizes like the decoding dataset's float32 mode.
    srcf = CocoDetectionDataset(
        src.images_dir, src.coco_path, 56, max_boxes=8,
        output_dtype="float32",
    )
    np.testing.assert_allclose(
        ex["images"], srcf.get_example(5)["images"], atol=1e-6
    )
    assert ex["image_id"] == srcf.get_example(5)["image_id"]


def test_max_boxes_resizing_and_guards(packed_fixture, tmp_path):
    _, packed_dir = packed_fixture
    # Narrowing slices the pad.
    ds = PackedDataset(packed_dir, max_boxes=4)
    assert ds.get_example(0)["boxes"].shape == (4, 4)
    # Widening pads with zeros/valid=False (exact padding semantics).
    wide = PackedDataset(packed_dir, max_boxes=16)
    ex = wide.get_example(0)
    assert ex["boxes"].shape == (16, 4)
    assert not ex["valid"][8:].any()
    assert (ex["boxes"][8:] == 0).all()
    b = wide.get_batch([0, 1])
    assert b["labels"].shape == (2, 16) and not b["valid"][:, 8:].any()
    with pytest.raises(ValueError, match="image_size"):
        PackedDataset(packed_dir, image_size=128)
    # Packing a float dataset is rejected (would bake normalization in).
    base = PackedDataset(packed_dir)
    srcf = CocoDetectionDataset(
        base.images_dir, base.coco_path, 56, output_dtype="float32",
    )
    with pytest.raises(ValueError, match="uint8"):
        pack_dataset(srcf, str(tmp_path / "bad"))


def test_cli_trains_from_packed(packed_fixture, tmp_path):
    """One tiny training epoch end-to-end via --packed_train_data."""
    from dinov2_od_tpu.train.cli import main

    _, packed_dir = packed_fixture
    out = tmp_path / "run"
    rc = main([
        "--packed_train_data", packed_dir,
        "--packed_val_data", packed_dir,
        "--lightweight",
        "--image_size", "56",
        "--batch_size", "4",
        "--num_classes", "6",
        "--num_epochs", "1",
        "--val_frequency", "1",
        "--output_dir", str(out),
    ])
    assert rc == 0
    assert (out / "metrics_epoch_0.json").exists()
