"""Persistent XLA compilation cache helper.

First compiles on this TPU runtime go through a remote compile service and
can take minutes for gnarly programs (measured: 375 s for the rejection
sampler's first call; 79 s for jax.random.dirichlet at 1e6). The persistent
cache makes every later process start warm.

Note the cpu_aot_loader "machine feature +prefer-no-scatter is not
supported" warnings printed when entries load on CPU: they are SPURIOUS
(the compiler records LLVM tuning preferences for this CPU model; the
loader's feature detector only lists hardware flags) and appear even for
entries this very process wrote. They do not indicate foreign or corrupt
entries.
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
