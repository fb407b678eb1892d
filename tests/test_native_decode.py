"""Native JPEG decoder (native/jpeg_decode.cc via data/native_decode.py).

Covers what the reference gets implicitly from PIL inside DataLoader
workers (reference dino_detector/dataset.py:55): pixel fidelity vs the
exact PIL decode, grayscale promotion, corrupt-input handling, and the
one-call batch API the C thread pool serves.
"""

import os

import numpy as np
import pytest
from PIL import Image

from dinov2_od_tpu.data import native_decode
from dinov2_od_tpu.data.coco import _decode_image, _decode_pil

pytestmark = pytest.mark.skipif(
    native_decode.get_lib() is None,
    reason="native jpeg decoder unavailable (no compiler/libjpeg)",
)


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (640, 480), (100, 160), (37, 53)]):
        # Low-frequency content so JPEG loss stays small and decoder
        # comparisons measure resampling, not compression artifacts.
        small = rng.uniform(0, 255, (8, 8, 3))
        arr = np.asarray(
            Image.fromarray(small.astype(np.uint8)).resize((w, h), Image.BILINEAR)
        )
        p = str(root / f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=92)
        paths.append(p)
    return paths


def test_decode_one_matches_pil(jpegs):
    """Scaled decode + C bilinear resize stays at resampling-kernel
    distance from full PIL decode + PIL bilinear resize."""
    for p in jpegs:
        ours = native_decode.decode_one(p, 224)
        assert ours is not None and ours.shape == (224, 224, 3)
        assert ours.dtype == np.uint8
        ref = _decode_pil(p, 224).astype(np.int16)
        mad = np.abs(ours.astype(np.int16) - ref).mean()
        assert mad < 6, f"{p}: MAD {mad}"


def test_decode_one_upsamples_small_images(jpegs):
    small = jpegs[-1]  # 37x53 -> 224: decoder must upsample, not crash
    out = native_decode.decode_one(small, 224)
    assert out is not None and out.shape == (224, 224, 3)


def test_grayscale_promoted_to_rgb(tmp_path):
    p = str(tmp_path / "g.jpg")
    Image.fromarray(
        np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    ).save(p)
    out = native_decode.decode_one(p, 32)
    assert out is not None
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])


def test_corrupt_file_returns_none_and_backend_falls_back(tmp_path):
    p = str(tmp_path / "bad.jpg")
    with open(p, "wb") as f:
        f.write(b"definitely not a jpeg")
    assert native_decode.decode_one(p, 32) is None
    with pytest.raises(Exception):
        _decode_image(p, 32, backend="auto")  # PIL fallback also rejects it


def test_non_jpeg_extension_skips_native(tmp_path):
    p = str(tmp_path / "img.png")
    Image.fromarray(np.full((40, 40, 3), 77, np.uint8)).save(p)
    out = _decode_image(p, 32, backend="auto")
    assert out.shape == (32, 32, 3)
    assert np.abs(out.astype(np.int16) - 77).max() <= 2


def test_batch_matches_single_and_reports_failures(jpegs, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"nope")
    paths = list(jpegs) + [bad]
    got = native_decode.decode_batch(paths, 96, num_threads=2)
    assert got is not None
    batch, failed = got
    assert batch.shape == (len(paths), 96, 96, 3)
    assert failed == [len(paths) - 1]
    for i, p in enumerate(jpegs):
        single = native_decode.decode_one(p, 96)
        np.testing.assert_array_equal(batch[i], single)
