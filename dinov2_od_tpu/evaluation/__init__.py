"""Evaluation: device-side detection post-processing and COCO mAP."""

from .coco_metrics import CocoEvaluator, compute_coco_metrics  # noqa: F401
from .postprocess import postprocess_detections  # noqa: F401
