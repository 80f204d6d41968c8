"""Headline benchmark: rank-100 randomized SVD of a 100k x 10k f32 matrix.

North-star config from BASELINE.json: the Gaussian-sketch power iteration
that PCA/POD/DMD all compose, on one TPU chip (multi-chip scales via
corrla_rs_tpu.parallel.sharded_rsvd).

Prints ONE JSON line:
  {"metric": ..., "value": <wall seconds>, "unit": "s", "vs_baseline": N}

vs_baseline: speedup over the reference-algorithm numpy implementation
(examples/benchmark_rsvd.py:16-53 semantics) measured on this machine's
CPU (single core, f32, same config) — recorded in BASELINE.md. The Rust
reference itself cannot run here (no cargo in the image); its own Python
benchmark harness treats the numpy path as the comparable baseline.
"""
from __future__ import annotations

try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import json
import time

import jax
import jax.numpy as jnp

from corrla_rs_tpu.ops.random_svd import random_svd

# Measured once on this machine (1-core CPU, numpy f32, same config/algorithm)
# — see BASELINE.md "measured baselines".
CPU_NUMPY_BASELINE_S = None  # filled from BASELINE.md if present

N_ROWS, N_COLS, RANK, N_ITER, N_OVERSAMPLES = 100_000, 10_000, 100, 8, 10


def _read_recorded_baseline() -> float | None:
    try:
        with open(__file__.replace("bench.py", "BASELINE.md")) as f:
            for line in f:
                if line.startswith("cpu_numpy_rsvd_100kx10k_r100_s:"):
                    return float(line.split(":")[1])
    except OSError:
        pass
    return None


def main():
    key = jax.random.key(0)
    k_data, k_rsvd = jax.random.split(key)
    a = jax.random.normal(k_data, (N_ROWS, N_COLS), dtype=jnp.float32)
    a.block_until_ready()

    @jax.jit
    def run(a):
        u, s, vt = random_svd(
            a, RANK, N_ITER, N_OVERSAMPLES, key=k_rsvd, stabilize="always",
            qr_method="cholesky", power_precision=jax.lax.Precision.HIGH,
        )
        # On this TPU runtime block_until_ready returns early; real
        # synchronization is ONE host fetch of a scalar that transitively
        # depends on every output (fused into the same executable so the
        # tunnel round-trip is paid exactly once).
        chk = s[-1] + u[0, 0] + vt[0, 0]
        return u, s, vt, chk

    def sync(out):
        return float(out[3])

    # compile + warmup
    sync(run(a))
    sync(run(a))

    # min over 5 reps: wall times on this tunneled runtime carry ±30%
    # jitter with occasional large outliers; min is the honest steady-state
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(run(a))
        times.append(time.perf_counter() - t0)
    wall = min(times)

    baseline = CPU_NUMPY_BASELINE_S or _read_recorded_baseline()
    vs = (baseline / wall) if baseline else None
    print(
        json.dumps(
            {
                "metric": "rsvd_100kx10k_f32_rank100_wall",
                "value": round(wall, 4),
                "unit": "s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
