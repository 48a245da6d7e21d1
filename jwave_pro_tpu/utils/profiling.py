"""Profiling helpers (SURVEY §5.1 — the reference only prints nanoTime
tables from perf tests; here: samples/s measurement that works through the
remote-TPU tunnel, plus a ``jax.profiler`` trace context)."""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["measure_samples_per_sec", "trace"]


def measure_samples_per_sec(step, x, k_short=2, k_long=8, repeats=3):
    """Throughput of ``step`` (shape-preserving fn) in samples/s.

    Times by differencing two chained-iteration lengths inside one jit —
    robust against async dispatch and host↔device latency (the reference's
    ``System.nanoTime`` pattern, ``MODWTFFTPerformanceTest.java:47-152``,
    measures dispatch on accelerators, not compute).
    """
    def chain(v, k):
        for _ in range(k):
            v = step(v)
        return jnp.sum(v.ravel()[:16])

    short = jax.jit(lambda v: chain(v, k_short))
    long = jax.jit(lambda v: chain(v, k_long))
    float(short(x))
    float(long(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(short(x))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long(x))
        t_l = time.perf_counter() - t0
        best = min(best, (t_l - t_s) / (k_long - k_short))
    # timing noise can drive the difference to ~0 for trivial steps
    best = max(best, 1e-9)
    return x.size / best


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """``jax.profiler`` trace context (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
