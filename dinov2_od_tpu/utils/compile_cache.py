"""Persistent XLA compilation cache.

The reference has nothing comparable (PyTorch eager needs no
compilation); under JAX every jitted program is compiled per process, and
on remote-attached TPUs (this machine's axon relay) a cold ViT-B train
step costs ~20-40s of server-side compile. The persistent cache writes
the compiled executable keyed by (HLO, compile options, platform) so
later processes — re-runs, evaluation after training, serving restarts —
deserialize instead of recompiling.
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


def enable_compilation_cache(cache_dir: str) -> None:
    """Turn on JAX's on-disk compilation cache at `cache_dir`.

    Thresholds are dropped to zero so every program is cached (the
    defaults skip sub-second compiles — but on a high-RTT relay even
    those pay a round trip). Safe to call more than once; call before
    the first jit compilation for full effect."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    logger.info("persistent compilation cache at %s", cache_dir)
