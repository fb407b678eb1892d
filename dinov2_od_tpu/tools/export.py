"""CLI: export a trained checkpoint to an AOT serving bundle.

    python -m dinov2_od_tpu.tools.export \\
        --checkpoint outputs/checkpoint_epoch_49 \\
        --model_name facebook/dinov2-base --num_classes 91 \\
        --output_dir serving/detector-v1 \\
        --batch_sizes 1,8,32 [--quantize int8] [--lightweight]

The bundle (StableHLO modules + weights + manifest, see
dinov2_od_tpu/export.py) serves without any model code:

    from dinov2_od_tpu.export import load_serving_bundle
    model = load_serving_bundle("serving/detector-v1")
    detections = model.detect(["img.jpg"])

The reference (mudit1729/dinov2-od) has no export path — serving there
requires its full Python package to rebuild the module graph around a
pickled state_dict (reference train.py:695).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint directory to export")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--model_name", type=str,
                   default="facebook/dinov2-base")
    p.add_argument("--num_classes", type=int, default=91)
    p.add_argument("--image_size", type=int, default=224)
    p.add_argument("--lightweight", action="store_true",
                   help="the CLIs' shared lightweight config table")
    p.add_argument("--batch_sizes", type=str, default="1,8,32",
                   help="comma-separated; one module exported per size")
    p.add_argument("--max_detections", type=int, default=100)
    p.add_argument("--quantize", type=str, default=None,
                   choices=[None, "int8"],
                   help="int8: W8A8 backbone serving path")
    p.add_argument("--no_normalize", action="store_true",
                   help="record that inputs are NOT ImageNet-normalized "
                        "(must match how the checkpoint was trained)")
    args = p.parse_args(argv)

    import jax

    from ..config import (
        detector_config_for_model_name,
        lightweight_detector_config,
    )
    from ..export import export_serving_bundle
    from ..models import init_detector_params
    from ..train.checkpoint import restore_checkpoint

    if args.lightweight:
        cfg = lightweight_detector_config(
            num_classes=args.num_classes, image_size=args.image_size
        )
    else:
        cfg = detector_config_for_model_name(
            args.model_name,
            num_classes=args.num_classes,
            image_size=args.image_size,
        )
    template = init_detector_params(jax.random.key(0), cfg)
    params, _, _, _ = restore_checkpoint(args.checkpoint, template, None)

    out = export_serving_bundle(
        params,
        cfg,
        args.output_dir,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        max_detections=args.max_detections,
        quantize=args.quantize,
        normalize=not args.no_normalize,
    )
    print(f"serving bundle written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
