"""Logging + TensorBoard, mirroring the reference observability surface
(dino_detector/utils.py:279-384): timestamped file+console logger,
SummaryWriter under <log_dir>/tensorboard/<timestamp>_<experiment>, scalar
and image logging helpers."""

from __future__ import annotations

import datetime
import logging
import os
from typing import Dict, Optional

import numpy as np


def setup_logger(
    save_dir: str, log_file: str = "train.log", level=logging.INFO
) -> logging.Logger:
    os.makedirs(save_dir, exist_ok=True)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    log_path = os.path.join(save_dir, f"{timestamp}_{log_file}")

    logger = logging.getLogger("dinov2_od_tpu")
    logger.setLevel(level)
    logger.handlers.clear()

    fh = logging.FileHandler(log_path)
    fh.setFormatter(
        logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    )
    logger.addHandler(fh)

    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(asctime)s - %(levelname)s - %(message)s"))
    logger.addHandler(ch)

    logger.info("Logging initialized: %s", log_path)
    return logger


def setup_tensorboard(save_dir: str, experiment_name: Optional[str] = None):
    """SummaryWriter under <save_dir>/tensorboard/<timestamp>[_<name>]
    (reference utils.py:317-341). Returns None if tensorboard is absent."""
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    sub = f"{timestamp}_{experiment_name}" if experiment_name else timestamp
    log_dir = os.path.join(save_dir, "tensorboard", sub)
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:  # noqa: BLE001
        logging.getLogger("dinov2_od_tpu").warning(
            "tensorboard unavailable; scalar logging disabled"
        )
        return None
    writer = SummaryWriter(log_dir=log_dir)
    print(f"TensorBoard logs will be saved to: {log_dir}")
    return writer


def log_metrics(writer, metrics: Dict, global_step: int, prefix: str = ""):
    if writer is None:
        return
    for name, value in metrics.items():
        try:
            writer.add_scalar(f"{prefix}{name}", float(np.asarray(value)), global_step)
        except (TypeError, ValueError):
            continue


def log_images(writer, images: np.ndarray, global_step: int = 0, tag: str = "images"):
    """Log up to 8 images [B, H, W, 3] (reference utils.py:360-384)."""
    if writer is None:
        return
    images = np.asarray(images)
    if images.ndim == 4:
        images = images[:8]
        # SummaryWriter wants NCHW.
        writer.add_images(tag, images.transpose(0, 3, 1, 2), global_step)
    else:
        writer.add_image(tag, images.transpose(2, 0, 1), global_step)
