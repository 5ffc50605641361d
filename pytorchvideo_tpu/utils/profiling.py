"""Profiling / tracing utilities.

The reference has no first-party profiler (SURVEY §5.1 — only
torch usage telemetry + fvcore benchmark harnesses). TPU-native
equivalents: jax.profiler traces viewable in XProf/TensorBoard, named
scopes for kernel attribution, and a DCE/async-proof timing helper (this
environment's TPU tunnel makes naive timing lie; see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for XProf: with trace('/tmp/tb'): step()."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope context for kernel attribution inside jitted fns."""
    return jax.named_scope(name)


def time_jitted(
    fn: Callable,
    *args,
    iters: int = 20,
    trials: int = 3,
) -> float:
    """Seconds per call of fn(*args) -> array, measured with an on-device
    fori_loop chained on a full-output reduction (differenced trip counts
    cancel dispatch/readback overhead; the data dependency defeats DCE and
    async-completion lies)."""

    @jax.jit
    def loop(args, n):
        x0 = args[0]

        def body(i, carry):
            x, acc = carry
            out = fn(x, *args[1:])
            probe = jnp.asarray(out).mean().astype(jnp.float32)
            return (x + (probe * 1e-24).astype(x.dtype), acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    float(loop(args, 1))
    float(loop(args, iters + 1))
    # difference the per-trip-count minima across trials (min of the
    # per-trial difference can go negative when dispatch noise through
    # the device tunnel exceeds the kernel time being measured)
    best_small = best_big = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(args, 1))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(args, iters + 1))
        best_big = min(best_big, time.perf_counter() - t0)
    diff = best_big - best_small
    if diff <= 0:
        raise RuntimeError(
            f"kernel time below measurement noise floor "
            f"(diff={diff * 1e3:.3f} ms over {iters} iters); raise `iters`"
        )
    return diff / iters
