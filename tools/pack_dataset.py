"""Pack a COCO image directory into pre-decoded uint8 memmaps.

Decode-once / replay-many: run this offline, then train with
`--packed_train_data <out>` — the training loop reads raw pixels with a
single memcpy per batch instead of re-decoding every JPEG every epoch
(the reference pays full decode per epoch per image,
dino_detector/dataset.py:55, train.py:584-587).

Usage:
  PYTHONPATH= python tools/pack_dataset.py \\
      --images /data/coco/train2017 \\
      --annotations /data/coco/annotations/instances_train2017.json \\
      --out /data/coco_packed_224 --image_size 224 --max_boxes 100
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True)
    ap.add_argument("--annotations", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--max_boxes", type=int, default=100)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--decode_backend", default="auto",
                    choices=["auto", "cv2", "pil"])
    args = ap.parse_args()

    from dinov2_od_tpu.data.coco import CocoDetectionDataset
    from dinov2_od_tpu.data.packed import pack_dataset

    ds = CocoDetectionDataset(
        args.images, args.annotations, args.image_size,
        max_boxes=args.max_boxes, output_dtype="uint8",
        decode_backend=args.decode_backend,
    )
    print(f"packing {len(ds)} images at {args.image_size}px "
          f"-> {args.out} ...")
    t0 = time.perf_counter()
    pack_dataset(ds, args.out, num_workers=args.num_workers)
    dt = time.perf_counter() - t0
    size_mb = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out)
    ) / 1e6
    print(f"packed {len(ds)} images in {dt:.1f}s "
          f"({len(ds) / dt:.1f} img/s), {size_mb:.0f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
