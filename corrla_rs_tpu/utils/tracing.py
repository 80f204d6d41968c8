"""Profiling / tracing harness.

The reference's only instrumentation is ad-hoc SystemTime deltas in tests
(SURVEY.md §5 "Tracing: none"). Here:

- ``trace(dir)``: context manager around ``jax.profiler.trace`` producing a
  TensorBoard/XProf trace of every XLA kernel.
- ``annotate(name)``: names a region inside a trace
  (``jax.profiler.TraceAnnotation``).
- ``timed(fn)``: wall-clock with a real device sync — on this TPU runtime
  ``block_until_ready`` returns early, so the sync is a scalar host fetch.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["trace", "annotate", "timed", "device_sync"]


def device_sync(tree) -> float:
    """Force real completion of every array in a pytree; returns a checksum."""
    total = 0.0
    for leaf in jax.tree.leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.size:
            total += float(jnp.real(leaf.ravel()[0]))
    return total


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region into ``log_dir`` (view with xprof/TensorBoard)."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named sub-region annotation for traces."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn, *args, n_runs: int = 3, **kwargs):
    """(best_wall_seconds, last_result) with warmup and honest sync."""
    result = fn(*args, **kwargs)
    device_sync(result)
    best = float("inf")
    for _ in range(n_runs):
        t0 = time.perf_counter()
        result = fn(*args, **kwargs)
        device_sync(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
