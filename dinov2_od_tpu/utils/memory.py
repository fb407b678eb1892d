"""Device memory introspection — the TPU equivalent of the reference's
CUDA memory debugging (dino_detector/validate.py): formatted usage stats,
largest live arrays, and a best-effort cache clear."""

from __future__ import annotations

import gc
from typing import Dict, List, Tuple

import jax


def memory_stats() -> Dict[str, float]:
    """Per-device memory usage in MB (reference validate.py:74-84)."""
    stats = {}
    for d in jax.local_devices():
        s = d.memory_stats() or {}
        mb = 1024 * 1024
        stats[str(d)] = {
            "bytes_in_use_mb": s.get("bytes_in_use", 0) / mb,
            "peak_bytes_in_use_mb": s.get("peak_bytes_in_use", 0) / mb,
            "bytes_limit_mb": s.get("bytes_limit", 0) / mb,
        }
    return stats


def format_memory_stats() -> str:
    lines = []
    for dev, s in memory_stats().items():
        lines.append(
            f"{dev}: in_use {s['bytes_in_use_mb']:.1f}MB  "
            f"peak {s['peak_bytes_in_use_mb']:.1f}MB  "
            f"limit {s['bytes_limit_mb']:.1f}MB"
        )
    return "\n".join(lines) or "no device memory stats available"


def live_arrays_by_size(top: int = 20) -> List[Tuple[str, float]]:
    """Largest live device arrays (reference validate.py:7-45 GC walk)."""
    out = []
    for arr in jax.live_arrays():
        try:
            out.append((f"{arr.dtype}{list(arr.shape)}", arr.nbytes / 1e6))
        except Exception:  # noqa: BLE001
            continue
    out.sort(key=lambda kv: -kv[1])
    return out[:top]


def clear_memory() -> None:
    """Best-effort release of cached buffers (reference validate.py:47-72)."""
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:  # noqa: BLE001
        pass
