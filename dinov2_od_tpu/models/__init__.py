"""Model definitions: DINOv2 ViT backbone with LoRA, DETR decoder
(standard and deformable), and the composed detector. All models are pure
functions over parameter pytrees — init_* builds params, *_apply runs the
forward pass — so they jit, shard, and checkpoint without framework glue."""

from .detector import (  # noqa: F401
    detector_apply,
    init_detector_params,
    trainable_mask,
)
