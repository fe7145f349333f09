"""Profiling / timing harness (SURVEY §5: the reference's never-built
``tictoc``/google-benchmark layer, done the JAX way)."""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["trace", "throughput", "Timer"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """``jax.profiler`` trace context — view with TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def throughput(fn, *args, reps: int = 20, items: int | None = None):
    """Median-free steady-state timing of a jitted function.

    IMPORTANT device note: on tunneled TPU backends, fetching *any* element
    of a device array streams the whole buffer to the host — polluting
    timings by orders of magnitude.  ``fn`` must therefore reduce its
    outputs to a SCALAR on device; this harness enforces that and fetches
    only the scalar.  Returns ``(seconds_per_call, items_per_sec)``.
    """
    out = fn(*args)
    if getattr(out, "ndim", None) != 0:
        raise ValueError(
            "throughput(fn): fn must return a 0-d scalar (reduce on device; "
            "see docstring re tunnel fetch pollution)"
        )
    # Warm up with a scalar FETCH: block_until_ready does not reliably block
    # through tunneled backends, and a cold timing loop absorbs compile time.
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(out)  # scalar fetch waits for the last execution
    dt = (time.perf_counter() - t0) / reps
    return dt, (items / dt if items else None)


class Timer:
    """Wall-clock section timer with named laps (tictoc, structured)."""

    def __init__(self):
        self.laps = {}
        self._t = time.perf_counter()

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        self.laps[name] = now - self._t
        self._t = now
        return self.laps[name]

    def report(self) -> dict:
        return dict(self.laps)
