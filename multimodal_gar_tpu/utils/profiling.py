"""Profiling utilities (SURVEY.md §5.1 — a green field in the reference,
which only has a wall-clock Timer).

- ``trace(logdir)``: context manager around jax.profiler.trace for
  TensorBoard-viewable device traces.
- ``time_fn``: compile-then-time a jitted callable with proper blocking.
- ``start_server``: on-demand profiler server for live capture.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> Tuple[float, Any]:
    """Returns (seconds_per_call, last_output); fn should be jitted."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
