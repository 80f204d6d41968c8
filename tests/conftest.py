"""Test config: run everything on a faked 8-device CPU backend.

Multi-chip hardware is not available in CI; sharding tests use 8 virtual CPU
devices (the multi-chip story the reference never had — SURVEY.md §4). x64
is enabled so tolerances match the reference's f64 test oracles.

NOTE: this environment registers a TPU PJRT plugin from sitecustomize at
interpreter boot with JAX_PLATFORMS=axon hardwired, so the platform MUST be
overridden via jax.config here (env vars in conftest are too late).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: XLA CPU compiles of QR/SVD kernels dominate
# test wall-clock; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
