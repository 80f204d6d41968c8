"""End-to-end UQ workflow on the Ishigami benchmark (extensions demo).

The full uncertainty-quantification loop the round-2 extensions enable,
none of which exists in the reference:

  1. screen inputs cheaply        (ops/morris, r*(d+1) evaluations)
  2. build a space-filling design (ops/design, scrambled Sobol')
  3. fit surrogates               (ops/pce + ops/gp.SparseGpRegressor)
  4. read sensitivities           (PCE coefficients, analytically)
  5. cross-check on the true model (ops/sobol pick-freeze estimators)
  6. ship the surrogate           (utils/export, compiled artifact)
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from corrla_rs_tpu import (
    PolynomialChaos,
    SparseGpRegressor,
    morris_screening,
    sobol_indices,
    sobol_sample,
)
from corrla_rs_tpu.utils.export import export_model_call, load_exported

BOUNDS = np.array([[-np.pi, np.pi]] * 3)
S1_EXACT = np.array([0.3139, 0.4424, 0.0])
ST_EXACT = np.array([0.5576, 0.4424, 0.2437])


def ishigami(x):
    return (jnp.sin(x[:, 0]) + 7.0 * jnp.sin(x[:, 1]) ** 2
            + 0.1 * x[:, 2] ** 4 * jnp.sin(x[:, 0]))


def main():
    # 1. Morris screening: 4 evaluations per trajectory
    scr = morris_screening(ishigami, BOUNDS, n_traj=128, key=0, n_levels=8)
    print("Morris mu*:", np.round(np.asarray(scr["mu_star"]), 3),
          "sigma:", np.round(np.asarray(scr["sigma"]), 3),
          "-> all inputs active")

    # 2-3. qmc design + PCE surrogate
    x = sobol_sample(BOUNDS, 4096, key=1)
    y = ishigami(x)
    pce = PolynomialChaos(9, "uniform", BOUNDS).fit(x, y)
    print(f"PCE(order 9): r2 {pce.r2:.5f}; mean {pce.mean:.4f} "
          f"(exact 3.5); var {pce.var:.3f} (exact 13.845)")

    # 4. analytic Sobol' indices from the PCE coefficients
    pc = pce.sobol_indices()
    print("PCE  S1:", np.round(np.asarray(pc["s1"]), 3),
          "(exact", S1_EXACT, ")")
    print("PCE  ST:", np.round(np.asarray(pc["st"]), 3),
          "(exact", ST_EXACT, ")")

    # 5. cross-check with pick-freeze estimators on the true model
    est = sobol_indices(ishigami, BOUNDS, 16384, key=2, plan="sobol")
    print("est  S1:", np.round(np.asarray(est["s1"]), 3),
          " ST:", np.round(np.asarray(est["st"]), 3))

    # sparse GP surrogate on the same design (non-polynomial alternative)
    gp = SparseGpRegressor("matern52", inducing=128, key=3).fit(x, y)
    xq = sobol_sample(BOUNDS, 512, key=4)
    gp_err = float(jnp.max(jnp.abs(gp.predict(xq)[0] - ishigami(xq))))
    print(f"SGPR(128 inducing): max err {gp_err:.3f} on held-out qmc points")

    # 6. export the PCE surrogate as a compiled serving artifact
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "ishigami_pce.stablehlo")
    export_model_call(pce, "predict", (xq,), path)
    serve = load_exported(path)
    delta = float(jnp.max(jnp.abs(serve(xq) - pce.predict(xq))))
    print(f"exported artifact reproduces the surrogate to {delta:.1e}")
    print("UQ demo OK")


if __name__ == "__main__":
    main()
