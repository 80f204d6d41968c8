"""Constrained-sampler benchmark — parity workload with reference
examples/benchmark_dirichlet_sampler.py.

Reference configs:
- rejection sampling (benchmark_dirichlet_sampler.py:104-131): 3-D
  U234/U235/U238 bounds, 3,000 samples, chunk 1e6, <= 500 shots, vs a
  pure-python rejection loop;
- hybrid MCMC (benchmark_dirichlet_sampler.py:68-87): 12 seed samples,
  gamma=0.8, eps=1e-12, alpha=0.6, 3,000 samples + acceptance ratio.

Plus the DREAM throughput demo (north-star kernel, not in the reference).
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import time

import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu import cs_dirichlet_sample, cs_mcmc_dirichlet_sample
from corrla_rs_tpu.ops.dream import dream_run

BOUNDS = np.array([[0.0, 0.0026], [0.1955, 0.1995], [0.80, 0.825]])


def py_rejection(bounds, n_samples, max_zshots=500, chunk=1_000_000):
    """Pure-python rejection baseline (reference harness :6-50)."""
    rng = np.random.default_rng(0)
    out = []
    for _ in range(max_zshots):
        z = rng.dirichlet(np.ones(len(bounds)), size=chunk)
        ok = np.all((bounds[:, 0] <= z) & (z <= bounds[:, 1]), axis=1)
        out.extend(z[ok])
        if len(out) >= n_samples:
            return np.asarray(out[:n_samples])
    raise RuntimeError("not enough samples")


def main():
    n = 3_000
    # corrla rejection sampler (on device); first call compiles
    t0 = time.perf_counter()
    s = cs_dirichlet_sample(BOUNDS, n, 500, 1_000_000, 1.0, np.ones(3))
    _ = float(s[-1, 0])
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = cs_dirichlet_sample(BOUNDS, n, 500, 1_000_000, 1.0, np.ones(3), seed=1)
    _ = float(s[-1, 0])
    t_dev = time.perf_counter() - t0
    print(f"cs_dirichlet_sample: {t_dev:.3f} s for {n} samples"
          f" (first call incl. compile: {t_first:.1f} s;"
          f" sum check: {float(jnp.max(jnp.abs(jnp.sum(s,1)-1.0))):.1e})")

    t0 = time.perf_counter()
    _sp = py_rejection(BOUNDS, n)
    print(f"pure-python rejection: {time.perf_counter()-t0:.3f} s")

    # hybrid MCMC (reference config: 12 seeds, gamma .8, eps 1e-12, a=.6)
    t0 = time.perf_counter()
    smc, ar = cs_mcmc_dirichlet_sample(
        BOUNDS, n, 12, 500, 1_000_000, 1.0, np.full(3, 0.6), 0.8, 1e-12
    )
    _ = float(smc[-1, 0])
    print(f"cs_mcmc_dirichlet_sample: {time.perf_counter()-t0:.3f} s,"
          f" {smc.shape[0]} samples, acceptance ratio {ar:.3f}")

    # DREAM throughput (north-star kernel)
    def lnp(x):
        return -0.5 * jnp.sum(x**2)

    heads0 = jnp.asarray(
        np.random.default_rng(1).standard_normal((8192, 3)), jnp.float32
    )
    hist, state = dream_run(heads0, lnp, 1000, key=0, n_adapt=100)
    _ = float(state.heads[0, 0])
    t0 = time.perf_counter()
    hist, state = dream_run(heads0, lnp, 1000, key=1, n_adapt=100)
    _ = float(state.heads[0, 0]) + float(hist[-1, 0, 0])
    dt = time.perf_counter() - t0
    print(f"DREAM: {8192*1000/dt/1e6:.2f} M samples/s"
          f" (8192 chains x 1000 gens in {dt:.3f} s)")


if __name__ == "__main__":
    main()
