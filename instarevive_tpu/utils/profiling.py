"""Profiling / tracing utilities.

Parity target (SURVEY.md §5 tracing): the reference has only wall-clock
timers; here we provide ``jax.profiler`` trace capture plus a stage timer
that reports per-stage device time for the restoration pipeline.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median wall time of a jitted fn (block_until_ready)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def pipeline_stage_times(pipe, params, lq, y, iters: int = 5) -> Dict[str, float]:
    """Per-stage timings of the restoration pipeline (seconds)."""
    import jax.numpy as jnp

    clean = jax.jit(lambda p, x: pipe.clean(p, x))
    enc = jax.jit(lambda p, x: pipe.encode(p, x))
    one = jax.jit(lambda p, z, yy: pipe.one_step(p, z, yy))
    dec = jax.jit(lambda p, z: pipe.decode(p, z))
    full = jax.jit(lambda p, x, yy: pipe.process(p, x, yy))

    stage1 = clean(params, lq)
    z = enc(params, stage1)
    out = {}
    out["swinir"] = time_fn(clean, params, lq, iters=iters)
    out["vae_encode"] = time_fn(enc, params, stage1, iters=iters)
    out["dit_one_step"] = time_fn(one, params, z, y, iters=iters)
    out["vae_decode"] = time_fn(dec, params, z, iters=iters)
    out["full_pipeline"] = time_fn(full, params, lq, y, iters=iters)
    return out
