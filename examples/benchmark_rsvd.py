"""RSVD benchmark — parity workload with reference examples/benchmark_rsvd.py.

Reference config (benchmark_rsvd.py:62-110): 100,000 x 10,000 Gaussian
matrix, rank 4, 8 power iterations, 10 oversamples, compared against the
pure-numpy implementation of the same algorithm. Also runs the rank-100
north-star config.

Run:  python examples/benchmark_rsvd.py [--with-numpy]
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu import random_svd
from corrla_rs_tpu.utils.tracing import timed


def numpy_rsvd(A, omega_rank=4, n_oversamples=10, power_iter=8, rng=None):
    """Reference-harness numpy algorithm (benchmark_rsvd.py:16-53)."""
    rng = rng or np.random.default_rng(0)
    omega = rng.standard_normal((A.shape[1], omega_rank + n_oversamples))
    Y = A @ omega
    for _ in range(power_iter):
        Y = A @ (A.T @ Y)
    Q, _ = np.linalg.qr(Y)
    B = Q.T @ A
    u_t, s, v = np.linalg.svd(B, full_matrices=False)
    u = Q @ u_t
    return u[:, :omega_rank], s[:omega_rank], v[:omega_rank]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-numpy", action="store_true",
                    help="also run the slow CPU numpy baseline")
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--cols", type=int, default=10_000)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    kd, kr = jax.random.split(jax.random.key(0))
    a = jax.random.normal(kd, (args.rows, args.cols), dtype=jnp.float32)

    for rank, label in [(4, "reference config"), (100, "north-star config")]:
        wall, (u, s, vt) = timed(
            lambda: random_svd(a, rank, 8, 10, key=kr, stabilize="always",
                               qr_method="cholesky")
        )
        print(f"rank-{rank} ({label}): {wall:.4f} s;"
              f" sigma[:4] = {np.asarray(s[:4])}")

    if args.with_numpy:
        an = np.asarray(a, dtype=np.float64)
        t0 = time.perf_counter()
        _u, s_np, _v = numpy_rsvd(an, 4, 10, 8)
        print(f"numpy rank-4: {time.perf_counter()-t0:.2f} s;"
              f" sigma = {s_np}")


if __name__ == "__main__":
    main()
