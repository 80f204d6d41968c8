"""PCA benchmark — parity workload with reference examples/benchmark_pca.py.

Reference config (benchmark_pca.py:10-34): 10,000 x 12 multivariate-normal
data, 4 components, compared against sklearn PCA when available.
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np

from corrla_rs_tpu import rpca
from corrla_rs_tpu.utils.tracing import timed


def main():
    rng = np.random.RandomState(42)
    cov = np.random.default_rng(0).uniform(0, 1, size=(12, 12))
    cov = cov @ cov.T + np.eye(12)
    x = rng.multivariate_normal(np.zeros(12), cov, size=10_000).astype(
        np.float32
    )

    wall, (s, comps) = timed(lambda: rpca(x, 4, 4, 6))
    print(f"corrla rpca: {wall:.4f} s; singular values = {np.asarray(s)[:,0]}")

    try:
        import time

        from sklearn.decomposition import PCA

        t0 = time.perf_counter()
        sk = PCA(4).fit(np.asarray(x, np.float64))
        print(f"sklearn PCA: {time.perf_counter()-t0:.4f} s;"
              f" singular values = {sk.singular_values_}")
        rel = np.abs(np.asarray(s)[:, 0] - sk.singular_values_) / sk.singular_values_
        print(f"sigma rel err vs sklearn: {rel.max():.2e}")
    except ImportError:
        print("sklearn not available; skipping comparison")


if __name__ == "__main__":
    main()
