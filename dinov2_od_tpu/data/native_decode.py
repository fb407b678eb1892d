"""ctypes bridge to the native JPEG decode+resize kernel
(native/jpeg_decode.cc).

The C path replaces the per-image Python work the reference does inside
torch DataLoader workers (reference dino_detector/dataset.py:55 PIL
decode, train.py:584-587 Resize): libjpeg-turbo DCT-domain scaled decode
with the full M/8 scale ladder (the cv2 fallback only has powers of two)
plus a fused bilinear resize into a caller buffer. Measured on this
host's single core: 557 img/s for 640px JPEG -> 224px uint8, vs 490
(cv2 reduced path) and 219 (reference-style full PIL decode) —
tools/bench_input.py.

Both entry points release the GIL for the whole decode (plain ctypes
calls), so the threaded DataLoader scales across cores without worker
processes; `decode_batch` additionally runs its own C thread pool for
one-call batch decode.

Builds on demand with `make -C native libjpegdecode.so`; every caller
must handle None/failure and fall back to the PIL path (corrupt files
and CMYK JPEGs report per-image failure by design).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("dinov2_od_tpu")

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libjpegdecode.so")

_lib = None
_load_attempted = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "libjpegdecode.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:  # noqa: BLE001
        logger.info("native jpeg decoder build unavailable (%s)", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the decoder library; None if unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.jpeg_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.jpeg_decode_resize.restype = ctypes.c_int
        lib.jpeg_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ]
        lib.jpeg_decode_resize_batch.restype = None
        _lib = lib
    except Exception as e:  # noqa: BLE001
        logger.info("native jpeg decoder load failed (%s)", e)
        _lib = None
    return _lib


def decode_one(path: str, image_size: int) -> Optional[np.ndarray]:
    """Decode+resize one JPEG to [S, S, 3] uint8 RGB; None on any failure
    (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((image_size, image_size, 3), np.uint8)
    rc = lib.jpeg_decode_resize(
        path.encode(), image_size, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def decode_batch(
    paths: Sequence[str], image_size: int, num_threads: int = 0
) -> Optional[Tuple[np.ndarray, List[int]]]:
    """One-call batch decode into a contiguous [N, S, S, 3] uint8 slab via
    the C thread pool (num_threads<=0 = hardware concurrency). Returns
    (batch, failed_indices) — failed slots are unspecified and must be
    re-decoded by the caller — or None when the library is unavailable."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.jpeg_decode_resize_batch(
        arr, n, image_size, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        int(num_threads),
    )
    failed = np.nonzero(status != 0)[0].tolist()
    return out, failed
