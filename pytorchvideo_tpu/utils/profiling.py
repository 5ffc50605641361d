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

    # Chain EVERY floating/complex array argument on the probe, not just the
    # first: anything not data-dependent on the loop carry is loop-invariant
    # and XLA hoists its entire dependent subgraph out of the fori_loop.
    # (Round-1 chained only args[0]; for SlowFast that hoisted the whole
    # fast pathway and inflated the measurement 2.2x: 1095 vs 496 clips/s
    # measured side by side on v5e.)
    @jax.jit
    def loop(args, n):
        def chain(a, probe):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact):
                return a + (probe * 1e-24).astype(a.dtype)
            return a

        def body(i, carry):
            xs, acc = carry
            out = fn(*xs)
            probe = jnp.asarray(out).mean().astype(jnp.float32)
            xs = jax.tree_util.tree_map(lambda a: chain(a, probe), xs)
            return (xs, acc + probe)

        _, acc = jax.lax.fori_loop(0, n, body, (tuple(args), jnp.float32(0)))
        return acc

    return _diff_trip_counts(loop, (args,), iters, trials)


def time_stateful(
    step_fn: Callable,
    state,
    *args,
    iters: int = 20,
    trials: int = 3,
) -> float:
    """Seconds per call of ``new_state, out = step_fn(state, *args)`` with
    the state CARRIED through the on-device fori_loop.

    Use this (not ``time_jitted``) for training steps: if the timed
    function's output is only a loss/step-counter scalar, the whole
    backward pass and optimizer update are dead code inside the loop and
    XLA eliminates them — round 2's train_throughput numbers (x3d_s 1661
    clips/s "train") were exactly this, measuring forward-only. Carrying
    the returned state into the next iteration keeps every parameter and
    optimizer-slot write live."""

    @jax.jit
    def loop(state, args, n):
        def chain(a, probe):
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.inexact):
                return a + (probe * 1e-24).astype(a.dtype)
            return a

        def body(i, carry):
            state, xs, acc = carry
            new_state, out = step_fn(state, *xs)
            probe = jnp.asarray(out).mean().astype(jnp.float32)
            xs = jax.tree_util.tree_map(lambda a: chain(a, probe), xs)
            return (new_state, xs, acc + probe)

        _, _, acc = jax.lax.fori_loop(
            0, n, body, (state, tuple(args), jnp.float32(0))
        )
        return acc

    return _diff_trip_counts(loop, (state, args), iters, trials)


def _diff_trip_counts(loop, loop_args, iters: int, trials: int) -> float:
    float(loop(*loop_args, 1))
    float(loop(*loop_args, iters + 1))
    # difference the per-trip-count minima across trials (min of the
    # per-trial difference can go negative when dispatch noise through
    # the device tunnel exceeds the kernel time being measured)
    best_small = best_big = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(loop(*loop_args, 1))
        best_small = min(best_small, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(loop(*loop_args, iters + 1))
        best_big = min(best_big, time.perf_counter() - t0)
    diff = best_big - best_small
    if diff <= 0:
        raise RuntimeError(
            f"kernel time below measurement noise floor "
            f"(diff={diff * 1e3:.3f} ms over {iters} iters); raise `iters`"
        )
    return diff / iters
