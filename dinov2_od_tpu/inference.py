"""High-level inference API.

The reference exposes inference only through the evaluation CLI
(train.py --only_evaluate); this gives users a direct serving surface:

    from dinov2_od_tpu.inference import Predictor
    p = Predictor.from_checkpoint("outputs/checkpoint_epoch_49",
                                  model_name="facebook/dinov2-base")
    detections = p.detect(["img1.jpg", "img2.jpg"], score_threshold=0.5)

TPU-minded serving details:
- LoRA factors are folded into the base kernels at load time (one GEMM per
  adapted linear).
- The forward is jitted once per (batch) shape; inputs are padded to the
  configured batch size so shapes stay static.
- Post-processing (sigmoid/top-k/rescale) runs on device.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import DetectorConfig, detector_config_for_model_name
from .data.coco import IMAGENET_MEAN, IMAGENET_STD, _load_image
from .evaluation.postprocess import format_detections, select_topk_detections
from .models import detector_apply, init_detector_params
from .models.detector import fold_detector_lora
from .train.checkpoint import restore_checkpoint


def prepare_images(
    images: Sequence[Union[str, np.ndarray]],
    image_size: int,
    normalize: bool,
):
    """File paths or [H,W,3] float arrays in [0,1] -> (pixel [N,S,S,3]
    float32, orig_sizes [N,2] int32). Shared by Predictor and the
    exported-bundle ServingModel (export.py)."""
    arrs, orig_sizes = [], []
    for im in images:
        if isinstance(im, str):
            from PIL import Image

            with Image.open(im) as pil:
                orig_sizes.append([pil.size[1], pil.size[0]])
            arr = _load_image(im, image_size)
        else:
            arr = np.asarray(im, np.float32)
            orig_sizes.append(list(arr.shape[:2]))
            if arr.shape[:2] != (image_size, image_size):
                from PIL import Image

                pil = Image.fromarray((arr * 255).astype(np.uint8))
                arr = (
                    np.asarray(
                        pil.resize(
                            (image_size, image_size),
                            Image.Resampling.BILINEAR,
                        ),
                        np.float32,
                    )
                    / 255.0
                )
        if normalize:
            arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
        arrs.append(arr)
    return np.stack(arrs), np.asarray(orig_sizes, np.int32)


class Predictor:
    def __init__(
        self,
        params,
        cfg: DetectorConfig,
        label_to_cat_id: Optional[Dict[int, int]] = None,
        class_names: Optional[Dict[int, str]] = None,
        batch_size: int = 8,
        normalize: bool = True,
        fold_lora: bool = True,
        quantize: Optional[str] = None,
        compilation_cache: Optional[str] = None,
    ):
        if compilation_cache:
            # Serving restarts skip the cold XLA compile (~20-40s on
            # remote-attached TPUs) by deserializing from this directory.
            from .utils.compile_cache import enable_compilation_cache

            enable_compilation_cache(compilation_cache)
        if fold_lora:
            params = fold_detector_lora(params, cfg)
        if quantize == "int8":
            # W8A8 serving path: backbone GEMMs on the MXU's int8 rate
            # (+25-28% eval throughput measured on v5e, BENCH.md;
            # requires folded LoRA — enforced by the quantizer).
            from .models.quantize import quantize_detector_int8

            params = quantize_detector_int8(params, cfg)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode: {quantize!r}")
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.normalize = normalize
        self.label_to_cat_id = label_to_cat_id or {}
        self.class_names = class_names or {}
        # One fused dispatch per batch: forward + device-side top-k
        # selection, so only ONE compact [B, K, 6] array (score, label,
        # x, y, w, h) crosses the link — a single D2H round trip per
        # chunk (jitted once per distinct max_detections).
        def _forward_topk(p, x, sizes, max_detections):
            out = detector_apply(p, cfg, x, deterministic=True)
            scores, labels, boxes = select_topk_detections(
                out["pred_logits"], out["pred_boxes"], sizes,
                max_detections=max_detections,
            )
            return jnp.concatenate(
                [
                    scores[..., None].astype(jnp.float32),
                    labels[..., None].astype(jnp.float32),
                    boxes.astype(jnp.float32),
                ],
                axis=-1,
            )

        self._forward_topk = jax.jit(
            _forward_topk, static_argnames=("max_detections",)
        )

    @classmethod
    def from_checkpoint(
        cls,
        checkpoint_path: str,
        model_name: str = "facebook/dinov2-base",
        num_classes: int = 91,
        detector_cfg: Optional[DetectorConfig] = None,
        **kwargs,
    ) -> "Predictor":
        cfg = detector_cfg or detector_config_for_model_name(
            model_name, num_classes=num_classes
        )
        template = init_detector_params(jax.random.key(0), cfg)
        params, _, _, _ = restore_checkpoint(checkpoint_path, template, None)
        return cls(params, cfg, **kwargs)

    def _prepare(self, images: Sequence[Union[str, np.ndarray]]):
        return prepare_images(
            images, self.cfg.backbone.image_size, self.normalize
        )

    def detect(
        self,
        images: Sequence[Union[str, np.ndarray]],
        score_threshold: float = 0.5,
        max_detections: int = 100,
    ) -> List[List[dict]]:
        """Run detection.

        Args:
          images: file paths, or [H, W, 3] float arrays in [0, 1].

        Returns:
          Per image: list of {"bbox": xywh pixels, "score", "category_id",
          "label" (contiguous), "name" (if class names known)}.
        """
        from collections import deque

        pixel, orig_sizes = self._prepare(images)
        n = len(pixel)
        bs = self.batch_size
        per_image: List[List[dict]] = [[] for _ in range(n)]

        def _drain(entry):
            out, start, count = entry
            topk = np.asarray(out)[:count]  # one D2H round trip
            results = format_detections(
                topk[..., 0],
                topk[..., 1].astype(np.int32),
                topk[..., 2:],
                np.arange(start, start + count),
                self.label_to_cat_id,
                score_threshold=score_threshold,
            )
            for r in results:
                idx = r["image_id"]
                det = {
                    "bbox": r["bbox"],
                    "score": r["score"],
                    "category_id": r["category_id"],
                }
                if self.class_names:
                    det["name"] = self.class_names.get(r["category_id"], "")
                per_image[idx].append(det)

        # Double-buffered: chunk i+1 is dispatched before chunk i's
        # (compact, top-k) results are read back, so device compute and
        # the D2H link overlap across chunks — same scheduling shape as
        # train/loop.py::evaluate_dataset.
        pending: deque = deque()
        for start in range(0, n, bs):
            chunk = pixel[start : start + bs]
            sizes = orig_sizes[start : start + bs]
            pad = bs - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
                sizes = np.concatenate([sizes, np.ones((pad, 2), sizes.dtype)])
            out = self._forward_topk(
                self.params, jnp.asarray(chunk), jnp.asarray(sizes),
                max_detections,
            )
            pending.append((out, start, bs - pad))
            if len(pending) > 1:
                _drain(pending.popleft())
        while pending:
            _drain(pending.popleft())
        return per_image
