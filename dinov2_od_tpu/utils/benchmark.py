"""Wall-clock benchmarking that is robust to async/remote dispatch.

On this TPU setup (axon relay), `block_until_ready` returns before the
computation actually finishes, and every host<->device interaction pays a
~30ms round trip. Reliable timing therefore requires:
  1. running N iterations *inside* one jitted program (lax.fori_loop with a
     genuine loop-carried dependency so XLA cannot hoist the body), and
  2. forcing a device->host readback of a scalar derived from the result,
  3. subtracting a 1-iteration baseline to remove the fixed overhead.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _scalar_probe(tree) -> jnp.ndarray:
    """A scalar that depends on EVERY element of every output leaf — a
    partial probe (e.g. out[0]) would let XLA dead-code-eliminate most of
    the measured computation."""
    leaves = jax.tree_util.tree_leaves(tree)
    acc = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def time_fn(
    fn: Callable,
    *args,
    iters: int = 0,
    target_seconds: float = 0.5,
    repeats: int = 3,
) -> float:
    """Average seconds per call of `fn(*args)` on device.

    `fn` must be side-effect free; its output must depend on its first
    argument. The first argument must be a float array (it gets an epsilon
    perturbation per iteration to carry the loop dependency).

    If `iters` is 0 the iteration count is chosen adaptively so the
    measured region is >= target_seconds, which keeps the ~30ms tunnel RTT
    jitter below a few percent of the signal. The reported value is the
    median slope over `repeats` runs.
    """

    compiled = {}

    def looped(n, timed=True):
        if n not in compiled:

            @jax.jit
            def run(*a):
                first, rest = a[0], a[1:]

                def body(i, carry):
                    out = fn(carry, *rest)
                    probe = _scalar_probe(out)
                    # Epsilon feedback keeps the loop body live without
                    # perturbing the math measurably.
                    return carry + (probe * 1e-30).astype(carry.dtype)

                return jax.lax.fori_loop(0, n, body, first)

            compiled[n] = run
            out = compiled[n](*args)  # compile
            float(out.ravel()[0].astype(jnp.float32))
        t0 = time.perf_counter()
        out = compiled[n](*args)
        float(out.ravel()[0].astype(jnp.float32))  # force readback
        return time.perf_counter() - t0

    if iters <= 0:
        # Estimate per-iter cost, then size the run to target_seconds.
        t8 = looped(8)
        est = max(t8 / 8, 1e-7)
        iters = max(8, min(int(target_seconds / est), 20000))

    n_small, n_big = max(1, iters // 8), iters
    samples = []
    for _ in range(repeats):
        ts = looped(n_small)
        tb = looped(n_big)
        samples.append(max((tb - ts) / (n_big - n_small), 1e-9))
    samples.sort()
    return samples[len(samples) // 2]


def measure_steps_per_sec(step_fn, state, batch, rng, iters: int = 10) -> Tuple[float, float]:
    """Time a (state, batch, rng) -> (state, metrics) train step by chaining
    states inside one jitted loop. Returns (sec_per_step, steps_per_sec)."""

    @jax.jit
    def run_n(state, batch, rng, n):
        def body(i, st):
            st, _ = step_fn(st, batch, jax.random.fold_in(rng, i))
            return st

        return jax.lax.fori_loop(0, n, body, state)

    @jax.jit
    def probe_sum(st):
        # A FRESH derived scalar (one element per param leaf): a brand-new
        # output buffer every call, so the remote runtime can never serve
        # its readback from a stale copy. Reading an UNCHANGED leaf slice
        # (e.g. a frozen backbone weight, which XLA aliases input->output)
        # did not reliably order after execution on the relay — the giant
        # warmup leaked into the 1-step baseline and the subtraction went
        # negative (BENCH.md round 5).
        acc = jnp.zeros((), jnp.float32)
        for leaf in jax.tree_util.tree_leaves(st.params):
            acc = acc + leaf.ravel()[0].astype(jnp.float32)
        return acc

    def timed(st0, n):
        t0 = time.perf_counter()
        st1 = run_n(st0, batch, rng, n)
        _ = float(probe_sum(st1))
        return time.perf_counter() - t0, st1

    # Warm up / compile, then one throwaway baseline round that drains
    # any execution still in flight behind the warmup's readback.
    st = run_n(state, batch, rng, 1)
    _ = float(probe_sum(st))
    _, st = timed(st, 1)

    t_base, st = timed(st, 1)
    n = iters
    t_total, st = timed(st, 1 + n)
    if t_total <= t_base * 1.05:
        # Degenerate subtraction (async backlog contaminated the
        # baseline): re-drain and re-measure once with a longer run.
        t_base, st = timed(st, 1)
        n = 4 * iters
        t_total, st = timed(st, 1 + n)
    per = (t_total - t_base) / n
    if per <= 0:
        # Last resort: overhead-inclusive bound (never a bogus 1e-9).
        per = t_total / (1 + n)
    return per, 1.0 / per
