"""Measure the PyTorch reference's training throughput on this host.

The reference (mudit1729/dinov2-od) publishes no numbers (BASELINE.md) and
supports only CUDA/CPU — on this TPU host it can only run on CPU. This
script executes the *actual reference code* (imported from
/root/reference, not copied) on random weights and times its train step:
forward + criterion (scipy Hungarian) + backward + Adam step.

`Dinov2Model.from_pretrained` is monkeypatched to random initialization
because this environment has no network egress; throughput is unaffected.

Results are cached in BASELINE_MEASURED.json at the repo root and consumed
by bench.py for the vs_baseline ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def measure(batch_size: int, steps: int, model_name: str, use_deformable: bool,
            image_size: int = 224) -> dict:
    sys.path.insert(0, REFERENCE)
    # The reference imports pycocotools at module level (utils.py:5); it is
    # not installed here and is irrelevant to step timing — stub it.
    import types

    if "pycocotools" not in sys.modules:
        pm = types.ModuleType("pycocotools")
        pm.coco = types.ModuleType("pycocotools.coco")
        pm.coco.COCO = object
        pm.cocoeval = types.ModuleType("pycocotools.cocoeval")
        pm.cocoeval.COCOeval = object
        sys.modules["pycocotools"] = pm
        sys.modules["pycocotools.coco"] = pm.coco
        sys.modules["pycocotools.cocoeval"] = pm.cocoeval

    import torch
    import transformers
    from transformers import Dinov2Config, Dinov2Model

    dims = {"small": 384, "base": 768, "large": 1024}
    variant = next((v for v in dims if v in model_name), "base")
    depth = {"small": 12, "base": 12, "large": 24}[variant]
    heads = {"small": 6, "base": 12, "large": 16}[variant]

    def fake_from_pretrained(name, *a, **k):
        cfg = Dinov2Config(
            hidden_size=dims[variant], num_hidden_layers=depth,
            num_attention_heads=heads, intermediate_size=dims[variant] * 4,
            image_size=518, patch_size=14,
        )
        return Dinov2Model(cfg)

    transformers.Dinov2Model.from_pretrained = classmethod(
        lambda cls, *a, **k: fake_from_pretrained(*a, **k)
    )

    from dino_detector.models.detector import DINOv2ObjectDetector
    from dino_detector.matching import HungarianMatcher
    from dino_detector.losses import SetCriterion

    torch.manual_seed(0)
    model = DINOv2ObjectDetector(
        num_classes=91, dino_model_name=model_name, use_deformable=use_deformable
    )
    model.train()
    matcher = HungarianMatcher()
    criterion = SetCriterion(
        matcher, num_classes=91,
        weight_dict={"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0},
    )
    params = [p for p in model.parameters() if p.requires_grad]
    opt = torch.optim.Adam(params, lr=1e-4, weight_decay=1e-4)

    images = torch.randn(batch_size, 3, image_size, image_size)
    targets = [
        {
            "labels": torch.randint(0, 91, (5,)),
            "boxes": torch.rand(5, 4) * 0.4 + 0.3,
        }
        for _ in range(batch_size)
    ]

    def one_step():
        outputs = model(images)
        losses = criterion(outputs, targets)
        loss = sum(losses.values())
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        opt.step()
        return float(loss)

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return {
        "model": model_name,
        "use_deformable": use_deformable,
        "batch_size": batch_size,
        "image_size": image_size,
        "sec_per_step": dt,
        "images_per_sec": batch_size / dt,
        "hardware": "host CPU (the only hardware the reference supports here)",
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--model", default="facebook/dinov2-base")
    p.add_argument("--deformable", action="store_true",
                   help="time the deformable decoder path too (SLOW: "
                        "reference uses a Python quadruple loop)")
    args = p.parse_args()

    out = {}
    out["standard_attention"] = measure(
        args.batch_size, args.steps, args.model, use_deformable=False
    )
    print(json.dumps(out["standard_attention"], indent=2))
    if args.deformable:
        out["deformable"] = measure(
            max(1, args.batch_size // 4), 1, args.model, use_deformable=True
        )
        print(json.dumps(out["deformable"], indent=2))

    path = os.path.join(REPO, "BASELINE_MEASURED.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"saved -> {path}")


if __name__ == "__main__":
    main()
