"""COCO dataset download + extraction.

Equivalent of the reference's standalone download_coco.py and the
integrated downloader in train.py:323-489: fetch train/val/test-dev images
and annotations with progress, extract zip/tar.gz archives, and print
ready-to-run training commands. Degrades gracefully when the environment
has no network egress.
"""

from __future__ import annotations

import os
import sys
import tarfile
import urllib.request
import zipfile
from typing import Optional

COCO_URLS = {
    "train_images": "http://images.cocodataset.org/zips/train2017.zip",
    "val_images": "http://images.cocodataset.org/zips/val2017.zip",
    "test_images": "http://images.cocodataset.org/zips/test2017.zip",
    "annotations": "http://images.cocodataset.org/annotations/annotations_trainval2017.zip",
    "test_info": "http://images.cocodataset.org/annotations/image_info_test2017.zip",
}


def download_file(url: str, dest: str, desc: Optional[str] = None) -> bool:
    """Download with a progress bar. Returns False on failure (no egress)."""
    if os.path.exists(dest):
        print(f"{dest} already exists, skipping download")
        return True
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    try:
        from tqdm import tqdm

        with tqdm(unit="B", unit_scale=True, desc=desc or os.path.basename(dest)) as bar:

            def hook(blocks, bs, total):
                if total > 0:
                    bar.total = total
                bar.update(bs)

            urllib.request.urlretrieve(url, dest, reporthook=hook)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"download of {url} failed: {e}", file=sys.stderr)
        if os.path.exists(dest):
            os.remove(dest)
        return False


def extract_archive(
    path: str,
    out_dir: str,
    max_samples: Optional[int] = None,
) -> bool:
    """Extract .zip or .tar.gz (reference download_coco.py:106-130).

    With max_samples set and an image archive, extract only that many
    .jpg files (plus every directory and non-image file) — the
    reference's debug-mode partial extraction (train.py:352-409).
    """
    print(f"extracting {path} -> {out_dir}")
    try:
        if path.endswith(".zip"):
            with zipfile.ZipFile(path) as z:
                names = z.namelist()
                if max_samples is not None and "images" in os.path.basename(path):
                    dirs = [n for n in names if n.endswith("/")]
                    imgs = [
                        n for n in names
                        if n.endswith(".jpg") and not n.endswith("/")
                    ][:max_samples]
                    other = [
                        n for n in names
                        if not n.endswith(".jpg") and not n.endswith("/")
                    ]
                    print(
                        f"debug mode: extracting {len(imgs)} images and "
                        f"{len(other)} other files"
                    )
                    names = dirs + imgs + other
                for name in names:
                    z.extract(name, out_dir)
        elif path.endswith((".tar.gz", ".tgz")):
            with tarfile.open(path, "r:gz") as t:
                t.extractall(out_dir)
        else:
            print(f"unknown archive format: {path}", file=sys.stderr)
            return False
        return True
    except Exception as e:  # noqa: BLE001
        print(f"extraction failed: {e}", file=sys.stderr)
        return False


def download_coco_dataset(
    data_dir: str,
    train: bool = False,
    val: bool = False,
    test: bool = False,
    max_samples: Optional[int] = None,
) -> bool:
    """Fetch+extract the requested COCO splits (reference train.py:411-489).

    max_samples caps image extraction per archive (debug mode,
    reference train.py:450-471)."""
    os.makedirs(data_dir, exist_ok=True)
    ok = True
    jobs = []
    if train:
        jobs.append(("train_images", "train2017.zip"))
        jobs.append(("annotations", "annotations_trainval2017.zip"))
    if val:
        jobs.append(("val_images", "val2017.zip"))
        if not train:
            jobs.append(("annotations", "annotations_trainval2017.zip"))
    if test:
        jobs.append(("test_images", "test2017.zip"))
        jobs.append(("test_info", "image_info_test2017.zip"))

    seen = set()
    for key, fname in jobs:
        if key in seen:
            continue
        seen.add(key)
        archive = os.path.join(data_dir, fname)
        if download_file(COCO_URLS[key], archive, desc=fname):
            ok &= extract_archive(archive, data_dir, max_samples=max_samples)
        else:
            ok = False
    if ok:
        print("\nDataset ready. Example commands:")
        print(
            f"  python -m dinov2_od_tpu.train --train_images {data_dir}/train2017 "
            f"--train_annotations {data_dir}/annotations/instances_train2017.json "
            f"--val_images {data_dir}/val2017 "
            f"--val_annotations {data_dir}/annotations/instances_val2017.json"
        )
    return ok


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Download COCO for dinov2_od_tpu")
    p.add_argument("--data_dir", default="coco_data")
    p.add_argument("--train", action="store_true")
    p.add_argument("--val", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--max_samples", type=int, default=None,
                   help="debug mode: extract at most N images per archive")
    args = p.parse_args(argv)
    if not (args.train or args.val or args.test):
        p.error("choose at least one of --train/--val/--test")
    return 0 if download_coco_dataset(
        args.data_dir, args.train, args.val, args.test,
        max_samples=args.max_samples,
    ) else 1


if __name__ == "__main__":
    sys.exit(main())
