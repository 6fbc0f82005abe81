"""Device profiling hooks.

The analog of the reference's profiling stack (SURVEY.md S10:
`bin/dpu-profiling` wrapping Linux perf, on-DPU perfcounters
`perfcounter.h:33-52`, Chrome-trace conversion): here a thin wrapper over
`jax.profiler` that captures an XLA/TPU trace viewable in TensorBoard or
Perfetto (the modern Chrome-trace), plus a lightweight per-call device-time
estimator based on repeated timed dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard / Perfetto readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, reps: int = 10) -> dict:
    """Median wall time of a jitted callable with device-completion fencing.

    Avoids device->host readbacks so the measurement reflects device
    execution (tunneled transports degrade dispatch after the first d2h
    transfer; see bench.py).
    """
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "median_s": times[len(times) // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "reps": reps,
    }
