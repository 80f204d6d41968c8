"""Active-subspace benchmark — README demo config (readme.md:104-110) plus
the anisotropic quality fixture from the reference test suite
(active_subspaces.rs:324-385)."""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np

from corrla_rs_tpu import active_ss
from corrla_rs_tpu.utils.tracing import timed


def main():
    rng = np.random.default_rng(0)

    # README demo shapes: x (1000, 10), order 1, 30 neighbors, 8 comps
    x = rng.standard_normal((1000, 10)).astype(np.float32)
    y = rng.standard_normal((1000, 1)).astype(np.float32)
    wall, (comps, vals, sensi) = timed(lambda: active_ss(x, y, 1, 30, 8))
    print(f"active_ss (1000 x 10, order 1): {wall:.4f} s;"
          f" comps {comps.shape}, sensi {np.asarray(sensi).round(3)}")

    # quality fixture: y = 0.2 x1 + 0.5 x2^2 + 0.1 x3 x1 -> x2 dominates
    cov = np.array([[0.9, 0.5, 0.5], [0.5, 0.9, 0.5], [0.5, 0.5, 0.9]])
    xs = rng.multivariate_normal(np.zeros(3), cov, size=400).astype(np.float32)
    ys = (0.2 * xs[:, 0] + 0.5 * xs[:, 1] ** 2
          + 0.1 * xs[:, 2] * xs[:, 0])[:, None].astype(np.float32)
    wall, (c2, v2, s2) = timed(lambda: active_ss(xs, ys, 2, 14, 2))
    s2 = np.asarray(s2)
    print(f"anisotropic fixture (order 2): {wall:.4f} s;"
          f" sensitivities = {s2.round(4)}"
          f" (x2 dominant: {bool(s2[1] > s2[0] and s2[1] > s2[2])})")


if __name__ == "__main__":
    main()
