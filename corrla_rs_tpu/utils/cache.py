"""Persistent XLA compilation cache helper.

First compiles on this TPU runtime go through a remote compile service and
can take minutes for gnarly programs (measured: 375 s for the rejection
sampler's first call; 79 s for jax.random.dirichlet at 1e6). The persistent
cache makes every later process start warm.
"""
from __future__ import annotations

import os

import jax

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path: str | None = None) -> None:
    path = path or os.path.expanduser("~/.cache/jax_comp_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
