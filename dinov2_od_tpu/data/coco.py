"""COCO dataset parsing with static-shape padded targets.

Semantics mirror the reference datasets (dino_detector/dataset.py):

- Raw COCO JSON parsed directly (no pycocotools), image_id -> annotation
  index (dataset.py:24-31).
- category_id remapped to a contiguous 0-based label by enumeration order
  of the JSON `categories` list (dataset.py:35, :96-99).
- Boxes converted to normalized cxcywh; crowd, degenerate (w/h <= 0), tiny
  (< 0.001) and out-of-range-center boxes dropped (dataset.py:75-91).
- Annotation-free test variant lists image files and derives ids from
  filename stems (dataset.py:145-150).

Divergence (required for jit): per-image targets are padded to `max_boxes`
with a validity mask instead of ragged lists (the reference's collate keeps
lists of dicts, dataset.py:194-219).

By default images are ImageNet-normalized — the reference omits
normalization entirely (train.py:584-587; SURVEY.md §7.4); pass
normalize=False for parity.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

_CV2 = None


def _cv2():
    global _CV2
    if _CV2 is None:
        try:
            import cv2

            # One decode per worker thread; intra-op threading just
            # fights the pool (and the single host core).
            cv2.setNumThreads(1)
            _CV2 = cv2
        except Exception:  # noqa: BLE001
            _CV2 = False
    return _CV2


def _decode_pil(path: str, image_size: int) -> np.ndarray:
    """Exact reference decode: full PIL load + bilinear resize
    (reference dataset.py:55, train.py:584-587). Returns uint8 HWC."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize(
            (image_size, image_size), Image.Resampling.BILINEAR
        )
        return np.asarray(im, np.uint8)


def _decode_fast(path: str, image_size: int) -> np.ndarray:
    """Fast decode: libjpeg scaled (DCT-domain) decode via cv2's
    IMREAD_REDUCED flags — the decoder emits at 1/2^k resolution chosen
    so the result stays >= the target — then SIMD bilinear resize.
    2.3x the PIL path on COCO-sized JPEGs (tools/bench_input.py); pixel
    values differ from PIL at the resampling-kernel level (mean ~2-6/255
    on worst-case noise images), so parity runs use backend='pil'."""
    cv2 = _cv2()
    if not cv2:
        return _decode_pil(path, image_size)
    import io

    from PIL import Image

    with open(path, "rb") as f:
        buf = f.read()
    # Header-only size peek (PIL lazy open reads no pixel data).
    try:
        with Image.open(io.BytesIO(buf)) as im:
            w, h = im.size
    except Exception:  # noqa: BLE001
        w = h = image_size * 8
    factor = 1
    while factor < 8 and min(w, h) // (factor * 2) >= image_size:
        factor *= 2
    flags = {
        1: cv2.IMREAD_COLOR,
        2: cv2.IMREAD_REDUCED_COLOR_2,
        4: cv2.IMREAD_REDUCED_COLOR_4,
        8: cv2.IMREAD_REDUCED_COLOR_8,
    }
    arr = cv2.imdecode(np.frombuffer(buf, np.uint8), flags[factor])
    if arr is None:
        return _decode_pil(path, image_size)
    if arr.ndim == 2:
        arr = cv2.cvtColor(arr, cv2.COLOR_GRAY2RGB)
    else:
        arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    return cv2.resize(
        arr, (image_size, image_size), interpolation=cv2.INTER_LINEAR
    )


def _decode_native(path: str, image_size: int) -> np.ndarray:
    """Native C decode (native/jpeg_decode.cc): libjpeg-turbo M/8 scaled
    decode + fused bilinear resize, GIL-free. 557 img/s vs 490 (cv2) /
    219 (full PIL) on this host — see data/native_decode.py. Non-JPEG
    files and CMYK fall back to the cv2/PIL path per image."""
    if path.lower().endswith((".jpg", ".jpeg")):
        from dinov2_od_tpu.data import native_decode

        out = native_decode.decode_one(path, image_size)
        if out is not None:
            return out
    return _decode_fast(path, image_size)


def _decode_image(path: str, image_size: int, backend: str = "auto") -> np.ndarray:
    if backend == "pil":
        return _decode_pil(path, image_size)
    if backend == "cv2":
        return _decode_fast(path, image_size)
    return _decode_native(path, image_size)


def _load_image(path: str, image_size: int) -> np.ndarray:
    return _decode_pil(path, image_size).astype(np.float32) / 255.0


class CocoDetectionDataset:
    """COCO images + annotations -> padded training examples."""

    def __init__(
        self,
        images_dir: str,
        annotation_file: str,
        image_size: int = 224,
        max_boxes: int = 100,
        normalize: bool = True,
        indices: Optional[List[int]] = None,
        output_dtype: str = "float32",
        decode_backend: str = "auto",
    ):
        self.images_dir = images_dir
        self.coco_path = annotation_file
        self.image_size = image_size
        self.max_boxes = max_boxes
        self.normalize = normalize
        # output_dtype='uint8' defers /255 + normalization to the jitted
        # step (train/step.py prep_images): the host ships raw bytes —
        # 4x less host->device traffic and no per-pixel fp32 host math.
        self.output_dtype = output_dtype
        self.decode_backend = decode_backend

        with open(annotation_file) as f:
            coco = json.load(f)
        self.images = {img["id"]: img for img in coco["images"]}
        self.annotations: Dict[int, list] = {}
        for ann in coco["annotations"]:
            self.annotations.setdefault(ann["image_id"], []).append(ann)
        self.image_ids = list(self.images.keys())
        if indices is not None:
            self.image_ids = [self.image_ids[i] for i in indices]
        # Contiguous remap in JSON enumeration order (dataset.py:35).
        self.cat_id_to_label = {
            cat["id"]: idx for idx, cat in enumerate(coco["categories"])
        }
        self.label_to_cat_id = {
            v: k for k, v in self.cat_id_to_label.items()
        }
        self.num_classes = len(self.cat_id_to_label)

    def __len__(self) -> int:
        return len(self.image_ids)

    def get_example(self, idx: int) -> Dict[str, np.ndarray]:
        img_id = self.image_ids[idx]
        info = self.images[img_id]
        image_u8 = _decode_image(
            os.path.join(self.images_dir, info["file_name"]),
            self.image_size,
            self.decode_backend,
        )
        if self.output_dtype == "uint8":
            image = image_u8
        else:
            image = image_u8.astype(np.float32) / 255.0
        height = info.get("height") or image.shape[0]
        width = info.get("width") or image.shape[1]

        boxes, labels = [], []
        for ann in self.annotations.get(img_id, []):
            if "bbox" not in ann or ann.get("iscrowd", 0) != 0:
                continue
            x, y, w, h = ann["bbox"]
            if w <= 0 or h <= 0:
                continue
            cx = (x + w / 2) / width
            cy = (y + h / 2) / height
            nw, nh = w / width, h / height
            if nw < 0.001 or nh < 0.001 or not (0 < cx < 1 and 0 < cy < 1):
                continue
            boxes.append([cx, cy, nw, nh])
            labels.append(self.cat_id_to_label.get(ann["category_id"], 0))

        n = min(len(boxes), self.max_boxes)
        out_boxes = np.zeros((self.max_boxes, 4), np.float32)
        out_labels = np.zeros((self.max_boxes,), np.int32)
        out_valid = np.zeros((self.max_boxes,), bool)
        if n:
            out_boxes[:n] = np.asarray(boxes[:n], np.float32)
            out_labels[:n] = np.asarray(labels[:n], np.int32)
            out_valid[:n] = True

        if self.normalize and self.output_dtype != "uint8":
            image = (image - IMAGENET_MEAN) / IMAGENET_STD

        return {
            "images": image,
            "boxes": out_boxes,
            "labels": out_labels,
            "valid": out_valid,
            "image_id": np.int64(img_id),
            "orig_size": np.asarray([height, width], np.int32),
        }


class CocoTestDataset:
    """Annotation-free evaluation dataset (reference: dataset.py:116-193)."""

    def __init__(
        self,
        images_dir: str,
        annotation_file: Optional[str] = None,
        image_size: int = 224,
        normalize: bool = True,
        indices: Optional[List[int]] = None,
        output_dtype: str = "float32",
        decode_backend: str = "auto",
    ):
        self.images_dir = images_dir
        self.image_size = image_size
        self.normalize = normalize
        self.output_dtype = output_dtype
        self.decode_backend = decode_backend
        self.coco_path = (
            annotation_file
            if annotation_file and os.path.exists(annotation_file)
            else None
        )
        if self.coco_path:
            with open(self.coco_path) as f:
                coco = json.load(f)
            self.images = {img["id"]: img for img in coco["images"]}
            self.image_ids = list(self.images.keys())
            self.cat_id_to_label = {
                c["id"]: i for i, c in enumerate(coco.get("categories", []))
            }
        else:
            files = sorted(
                f
                for f in os.listdir(images_dir)
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
            self.image_ids = [int(os.path.splitext(f)[0]) for f in files]
            self.images = {
                i: {"file_name": f, "id": i}
                for i, f in zip(self.image_ids, files)
            }
            self.cat_id_to_label = {}
        if indices is not None:
            self.image_ids = [self.image_ids[i] for i in indices]
        self.label_to_cat_id = {v: k for k, v in self.cat_id_to_label.items()}

    def __len__(self) -> int:
        return len(self.image_ids)

    def get_example(self, idx: int) -> Dict[str, np.ndarray]:
        img_id = self.image_ids[idx]
        info = self.images[img_id]
        from PIL import Image

        path = os.path.join(self.images_dir, info["file_name"])
        with Image.open(path) as im:
            width, height = im.size
        image_u8 = _decode_image(path, self.image_size, self.decode_backend)
        if self.output_dtype == "uint8":
            image = image_u8
        else:
            image = image_u8.astype(np.float32) / 255.0
            if self.normalize:
                image = (image - IMAGENET_MEAN) / IMAGENET_STD
        return {
            "images": image,
            "image_id": np.int64(img_id),
            "orig_size": np.asarray([height, width], np.int32),
        }
