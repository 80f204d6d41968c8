"""RBF interpolation benchmark — parity workload with reference
examples/benchmark_rbf_interp.py: N-D multiquadric interpolation fit +
predict, compared against scipy.interpolate.RBFInterpolator when available.
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np

from corrla_rs_tpu import RbfInterp
from corrla_rs_tpu.utils.tracing import timed


def main():
    rng = np.random.default_rng(0)
    n_fit, n_query, dim = 2_000, 500, 3
    x = rng.standard_normal((n_fit, dim)).astype(np.float32)
    y = np.sin(x).sum(axis=1, keepdims=True).astype(np.float32)
    xq = (rng.standard_normal((n_query, dim)) * 0.8).astype(np.float32)
    yq_true = np.sin(xq).sum(axis=1, keepdims=True)

    rbf = RbfInterp(2, 1.0, dim, 1)
    wall_fit, _ = timed(lambda: rbf.fit(x, y), n_runs=1)
    wall_pred, pred = timed(lambda: rbf.predict(xq))
    err = float(np.abs(np.asarray(pred) - yq_true).max())
    print(f"corrla RbfInterp ({n_fit} pts, {dim}-D): fit {wall_fit:.4f} s,"
          f" predict {wall_pred:.4f} s, max err {err:.4f}")

    try:
        import time

        from scipy.interpolate import RBFInterpolator

        t0 = time.perf_counter()
        sp = RBFInterpolator(
            np.asarray(x, np.float64), np.asarray(y, np.float64),
            kernel="multiquadric", epsilon=1.0, degree=1,
        )
        t_fit = time.perf_counter() - t0
        t0 = time.perf_counter()
        sp_pred = sp(np.asarray(xq, np.float64))
        t_pred = time.perf_counter() - t0
        sp_err = float(np.abs(sp_pred - yq_true).max())
        print(f"scipy RBFInterpolator: fit {t_fit:.4f} s,"
              f" predict {t_pred:.4f} s, max err {sp_err:.4f}")
    except ImportError:
        print("scipy not available; skipping comparison")


if __name__ == "__main__":
    main()
