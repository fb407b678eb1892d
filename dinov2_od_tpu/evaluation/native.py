"""ctypes bridge to the C++ COCO-eval matching kernel (native/coco_eval.cc).

Builds on demand with `make -C native` (g++); falls back to None when no
compiler is available so the numpy path keeps working.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger("dinov2_od_tpu")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcocoeval.so")

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # noqa: BLE001
        logger.info("native coco_eval build unavailable (%s); using numpy", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cocoeval_match_cell.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # dt_boxes, n_dt
            ctypes.POINTER(ctypes.c_double),                   # gt_boxes
            ctypes.POINTER(ctypes.c_int32),                    # gt_ignore
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,    # gt_crowd, n_gt
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # iou_thrs, n_thr
            ctypes.c_double, ctypes.c_double,                  # area range
            ctypes.POINTER(ctypes.c_int64),                    # dtm out
            ctypes.POINTER(ctypes.c_uint8),                    # dt_ignore out
        ]
        lib.cocoeval_match_cell.restype = None
        lib.cocoeval_match_category.argtypes = [
            ctypes.POINTER(ctypes.c_double),                   # dt_boxes
            ctypes.POINTER(ctypes.c_int64),                    # dt_off
            ctypes.POINTER(ctypes.c_double),                   # gt_boxes
            ctypes.POINTER(ctypes.c_int32),                    # gt_crowd
            ctypes.POINTER(ctypes.c_double),                   # gt_area
            ctypes.POINTER(ctypes.c_int64),                    # gt_off
            ctypes.c_int64,                                    # n_img
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # iou_thrs, n_thr
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,   # area_rngs, n_area
            ctypes.POINTER(ctypes.c_int32),                    # dtm out
            ctypes.POINTER(ctypes.c_uint8),                    # dt_ignore out
            ctypes.POINTER(ctypes.c_int32),                    # num_gt out
        ]
        lib.cocoeval_match_category.restype = None
        _lib = lib
    except OSError as e:
        logger.info("native coco_eval load failed (%s); using numpy", e)
    return _lib


def match_cell_native(
    dt_boxes: np.ndarray,      # [n_dt, 4] sorted by score desc, <= max_det
    gt_boxes: np.ndarray,      # [n_gt, 4] sorted non-ignored first
    gt_ignore: np.ndarray,     # [n_gt] int32
    gt_crowd: np.ndarray,      # [n_gt] int32
    iou_thrs: np.ndarray,
    area_rng,
):
    """Run the C++ kernel. Caller guarantees ordering contracts."""
    lib = get_lib()
    assert lib is not None
    n_dt, n_gt, n_thr = len(dt_boxes), len(gt_boxes), len(iou_thrs)
    dt_boxes = np.ascontiguousarray(dt_boxes, np.float64)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.int32)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.int32)
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    dtm = np.zeros((n_thr, n_dt), np.int64)
    dt_ig = np.zeros((n_thr, n_dt), np.uint8)

    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.cocoeval_match_cell(
        p(dt_boxes, ctypes.c_double), n_dt,
        p(gt_boxes, ctypes.c_double),
        p(gt_ignore, ctypes.c_int32),
        p(gt_crowd, ctypes.c_int32), n_gt,
        p(thrs, ctypes.c_double), n_thr,
        float(area_rng[0]), float(area_rng[1]),
        p(dtm, ctypes.c_int64),
        p(dt_ig, ctypes.c_uint8),
    )
    return dtm, dt_ig.astype(bool)


def match_category_native(
    dt_boxes: np.ndarray,    # [total_dt, 4] per-image segments, score-desc
    dt_off: np.ndarray,      # [n_img+1] int64
    gt_boxes: np.ndarray,    # [total_gt, 4]
    gt_crowd: np.ndarray,    # [total_gt] int32
    gt_area: np.ndarray,     # [total_gt] float64
    gt_off: np.ndarray,      # [n_img+1] int64
    iou_thrs: np.ndarray,
    area_rngs: np.ndarray,   # [n_area, 2] float64
):
    """Batched per-category matching (see native/coco_eval.cc
    cocoeval_match_category). Returns (dtm [A,T,N], dt_ignore [A,T,N] bool,
    num_gt [A])."""
    lib = get_lib()
    assert lib is not None
    n_img = len(dt_off) - 1
    n_thr, n_area = len(iou_thrs), len(area_rngs)
    total_dt = int(dt_off[-1])
    dt_boxes = np.ascontiguousarray(dt_boxes, np.float64)
    dt_off = np.ascontiguousarray(dt_off, np.int64)
    gt_boxes = np.ascontiguousarray(gt_boxes, np.float64)
    gt_crowd = np.ascontiguousarray(gt_crowd, np.int32)
    gt_area = np.ascontiguousarray(gt_area, np.float64)
    gt_off = np.ascontiguousarray(gt_off, np.int64)
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    rngs = np.ascontiguousarray(area_rngs, np.float64)
    dtm = np.zeros((n_area, n_thr, total_dt), np.int32)
    dt_ig = np.zeros((n_area, n_thr, total_dt), np.uint8)
    num_gt = np.zeros(n_area, np.int32)

    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))
    lib.cocoeval_match_category(
        p(dt_boxes, ctypes.c_double), p(dt_off, ctypes.c_int64),
        p(gt_boxes, ctypes.c_double), p(gt_crowd, ctypes.c_int32),
        p(gt_area, ctypes.c_double), p(gt_off, ctypes.c_int64),
        n_img,
        p(thrs, ctypes.c_double), n_thr,
        p(rngs, ctypes.c_double), n_area,
        p(dtm, ctypes.c_int32),
        p(dt_ig, ctypes.c_uint8),
        p(num_gt, ctypes.c_int32),
    )
    return dtm, dt_ig.astype(bool), num_gt
