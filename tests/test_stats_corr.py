"""stats_corr parity tests (oracles from reference stats_corr.rs:253-416)."""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops import stats_corr as sc
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def test_pearson_identity(rng):
    # Uncorrelated gaussians -> corr ~= I at 1e-1 (stats_corr.rs:259-277).
    x = jnp.asarray(rng.standard_normal((10000, 5)))
    assert_mat_approx_eq(sc.pearson_corr(x), jnp.eye(5), 1e-1)


def test_cov_identity(rng):
    x = jnp.asarray(rng.standard_normal((10000, 5)))
    assert_mat_approx_eq(sc.mat_cov_centered(x), jnp.eye(5), 1e-1)


def test_cov_matches_numpy(rng):
    x = jnp.asarray(rng.standard_normal((500, 4)) @ rng.standard_normal((4, 4)))
    assert_mat_approx_eq(
        sc.mat_cov_centered(x), np.cov(np.asarray(x), rowvar=False), 1e-8
    )


def test_linear_fit_oracle():
    # Points on a line with slope 0.5 (stats_corr.rs:301-347).
    x = jnp.array([[0.0], [0.25], [0.5], [0.75], [1.0]])
    y = x / 2.0
    jac = sc.jac_from_lin(x, y)
    assert_mat_approx_eq(jac, jnp.array([[0.5]]), 1e-8)

    xd = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    yd = jnp.array([[0.0], [0.5], [0.5], [1.0]])
    jac_d = sc.jac_from_lin(xd, yd)
    assert_mat_approx_eq(jac_d, jnp.array([[0.5, 0.5]]), 1e-8)


def test_col_interactions_oracle():
    # Oracle from stats_corr.rs:374-391.
    x = jnp.tile(jnp.array([[1.0, 2.0, 3.0, 4.0]]), (4, 1))
    res = sc.mat_col_interactions(x, True)
    expected = jnp.tile(
        jnp.array([[1.0, 2, 3, 4, 4, 6, 8, 9, 12, 16]]), (4, 1)
    )
    assert_mat_approx_eq(res, expected, 1e-12)
    res_ns = sc.mat_col_interactions(x, False)
    assert res_ns.shape == (4, 6)


def test_quad_fit_and_jac(rng):
    # Fit y = x1^2 + 2 x2^2 + 3 x1 x2 + x1 - 1 exactly; gradient analytic.
    x = jnp.asarray(rng.standard_normal((50, 2)))
    y = (x[:, 0] ** 2 + 2 * x[:, 1] ** 2 + 3 * x[:, 0] * x[:, 1] + x[:, 0] - 1.0)[
        :, None
    ]
    coeffs = sc.quad_fit(x, y)
    y_hat = sc.quad_eval(x, coeffs)
    assert_mat_approx_eq(y_hat, y, 1e-6)
    x0 = jnp.array([[1.0, -1.0]])
    jac = sc.jac_from_quad(x0, coeffs)
    # dy/dx1 = 2 x1 + 3 x2 + 1 = 0 ; dy/dx2 = 4 x2 + 3 x1 = -1
    assert_mat_approx_eq(jac, jnp.array([[0.0, -1.0]]), 1e-6)


def test_rsquared_sens(rng):
    # Parity with stats_corr.rs:394-415: R^2 in (0, 1).
    cov = jnp.array([[0.9, 0.5], [0.5, 0.9]])
    x = sc.sample_mv_normal(cov, 100, key=0)
    y = (x[:, 0] + x[:, 1] ** 2)[:, None]
    rsq = sc.rsquared_sens(x, y, cor_dof=True)
    assert rsq.shape == (1, 1)
    assert 0.0 < float(rsq[0, 0]) < 1.0


def test_sample_mv_normal_modes(rng):
    cov = jnp.array([[2.0, 0.5], [0.5, 1.0]])
    # cholesky mode: sample covariance ~= cov
    s = sc.sample_mv_normal(cov, 200000, key=1)
    emp = np.cov(np.asarray(s), rowvar=False)
    assert_mat_approx_eq(emp, cov, 5e-2)
    # reference mode reproduces the quirk: covariance == cov @ cov^T
    s_ref = sc.sample_mv_normal(cov, 200000, key=2, mode="reference")
    emp_ref = np.cov(np.asarray(s_ref), rowvar=False)
    assert_mat_approx_eq(emp_ref, np.asarray(cov) @ np.asarray(cov).T, 2e-1)


def test_sandwich_prop():
    cov = jnp.eye(3) * 2.0
    jac = jnp.array([[1.0, 0.0, 1.0]])
    out = sc.sandwich_prop(cov, jac)
    assert_mat_approx_eq(out, jnp.array([[4.0]]), 1e-12)


def test_mat_col_powers():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    out = sc.mat_col_powers(x, 3)
    expected = jnp.array([[1, 2, 1, 4, 1, 8], [3, 4, 9, 16, 27, 64.0]])
    assert_mat_approx_eq(out, expected, 1e-12)
