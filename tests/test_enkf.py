"""Ensemble data assimilation (ops/enkf) tests.

Oracles: the ETKF analysis mean and sample covariance must equal the
CLOSED-FORM Kalman update built from the same sample statistics
exactly (deterministic identities, f64 tolerances); the stochastic
EnKF converges to the same statistically; ES-MDA matches the analytic
linear-Gaussian posterior; the scan filter beats both the free run
and the raw observations on a tracking problem.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.enkf import (
    enkf_analysis, enkf_filter, esmda, etkf_analysis,
)
from corrla_rs_tpu.ops.enkf import (
    _enkf_kernel_ens_space, _enkf_kernel_obs_space,
)


def _setup(n=6, p=3, n_ens=40, seed=0):
    rng = np.random.default_rng(seed)
    x_ens = rng.normal(size=(n_ens, n)) @ rng.normal(size=(n, n)) \
        + rng.normal(size=n)
    h = rng.normal(size=(p, n))
    r_diag = rng.uniform(0.2, 1.0, size=p)
    y_obs = rng.normal(size=p)
    return jnp.asarray(x_ens), jnp.asarray(h), jnp.asarray(r_diag), \
        jnp.asarray(y_obs)


def _sample_kalman_update(x_ens, h, r_mat, y_obs):
    """Exact Kalman mean/cov from the SAMPLE covariances."""
    n_ens = x_ens.shape[0]
    xbar = jnp.mean(x_ens, axis=0)
    xa = x_ens - xbar
    ya = xa @ h.T
    c_xy = xa.T @ ya / (n_ens - 1)
    c_yy = ya.T @ ya / (n_ens - 1) + r_mat
    gain = jnp.linalg.solve(c_yy, c_xy.T).T
    mean_a = xbar + gain @ (y_obs - h @ xbar)
    p_b = xa.T @ xa / (n_ens - 1)
    cov_a = p_b - gain @ c_xy.T
    return mean_a, cov_a


class TestEtkf:
    def test_mean_matches_sample_kalman_exactly(self):
        x_ens, h, r_diag, y_obs = _setup()
        out = etkf_analysis(x_ens, y_obs, h, r_diag)
        mean_a, _ = _sample_kalman_update(
            x_ens, h, jnp.diag(r_diag), y_obs)
        np.testing.assert_allclose(
            np.mean(out, axis=0), mean_a, rtol=0, atol=1e-10)

    def test_cov_matches_sample_kalman_exactly(self):
        x_ens, h, r_diag, y_obs = _setup(n_ens=60)
        out = etkf_analysis(x_ens, y_obs, h, r_diag)
        _, cov_a = _sample_kalman_update(
            x_ens, h, jnp.diag(r_diag), y_obs)
        anom = out - jnp.mean(out, axis=0)
        cov_out = anom.T @ anom / (out.shape[0] - 1)
        np.testing.assert_allclose(cov_out, cov_a, rtol=0, atol=1e-10)

    def test_full_r_whitening(self):
        # a full (non-diagonal) R must give the same answer as the
        # closed form with that R
        x_ens, h, _, y_obs = _setup(p=3)
        rng = np.random.default_rng(3)
        a = rng.normal(size=(3, 3))
        r_full = jnp.asarray(a @ a.T + 0.5 * np.eye(3))
        out = etkf_analysis(x_ens, y_obs, h, r_full)
        mean_a, cov_a = _sample_kalman_update(x_ens, h, r_full, y_obs)
        np.testing.assert_allclose(
            np.mean(out, axis=0), mean_a, atol=1e-10)
        anom = out - jnp.mean(out, axis=0)
        np.testing.assert_allclose(
            anom.T @ anom / (out.shape[0] - 1), cov_a, atol=1e-10)

    def test_callable_h_matches_matrix(self):
        x_ens, h, r_diag, y_obs = _setup()
        h_np = np.asarray(h)
        out_mat = etkf_analysis(x_ens, y_obs, h, r_diag)
        out_fn = etkf_analysis(
            x_ens, y_obs, lambda x: jnp.asarray(h_np) @ x, r_diag)
        np.testing.assert_allclose(out_mat, out_fn, atol=1e-12)

    def test_inflation_widens_prior(self):
        x_ens, h, r_diag, y_obs = _setup()
        out1 = etkf_analysis(x_ens, y_obs, h, r_diag, inflation=1.0)
        out2 = etkf_analysis(x_ens, y_obs, h, r_diag, inflation=1.5)
        assert float(jnp.std(out2)) > float(jnp.std(out1))


class TestStochasticEnkf:
    def test_large_ensemble_matches_posterior(self):
        # linear-Gaussian: the perturbed-obs EnKF converges to the
        # exact Bayes posterior as N grows
        rng = np.random.default_rng(1)
        n, p, n_ens = 4, 2, 20000
        prior_mean = rng.normal(size=n)
        a = rng.normal(size=(n, n))
        prior_cov = a @ a.T + np.eye(n)
        h = rng.normal(size=(p, n))
        r = np.diag(rng.uniform(0.5, 1.0, size=p))
        y_obs = rng.normal(size=p)
        gain = prior_cov @ h.T @ np.linalg.inv(h @ prior_cov @ h.T + r)
        post_mean = prior_mean + gain @ (y_obs - h @ prior_mean)
        post_cov = prior_cov - gain @ h @ prior_cov

        chol = np.linalg.cholesky(prior_cov)
        x_ens = prior_mean + rng.normal(size=(n_ens, n)) @ chol.T
        out = enkf_analysis(
            jnp.asarray(x_ens), jnp.asarray(y_obs), jnp.asarray(h),
            jnp.asarray(np.diag(r)), jax.random.key(0))
        got_mean = np.mean(np.asarray(out), axis=0)
        anom = np.asarray(out) - got_mean
        got_cov = anom.T @ anom / (n_ens - 1)
        np.testing.assert_allclose(got_mean, post_mean, atol=0.08)
        np.testing.assert_allclose(got_cov, post_cov, atol=0.12)

    def test_woodbury_matches_obs_space(self):
        # p >> N with diagonal R: the ensemble-space (Woodbury) kernel
        # must agree with the direct (p, p) solve on identical inputs
        rng = np.random.default_rng(2)
        n_ens, n, p = 12, 5, 100
        x_ens = jnp.asarray(rng.normal(size=(n_ens, n)))
        h = rng.normal(size=(p, n))
        y_ens = x_ens @ jnp.asarray(h.T)
        r_diag = jnp.asarray(rng.uniform(0.5, 2.0, size=p))
        d_pert = jnp.asarray(rng.normal(size=(n_ens, p)))
        out_obs = _enkf_kernel_obs_space(
            x_ens, y_ens, d_pert, jnp.diag(r_diag))
        out_ens = _enkf_kernel_ens_space(
            x_ens, y_ens, d_pert, 1.0 / r_diag)
        np.testing.assert_allclose(out_obs, out_ens, atol=1e-9)

    def test_validates(self):
        x_ens, h, r_diag, y_obs = _setup()
        with pytest.raises(ValueError, match="at least 2"):
            enkf_analysis(x_ens[:1], y_obs, h, r_diag,
                          jax.random.key(0))
        with pytest.raises(ValueError, match="diagonal r"):
            enkf_analysis(x_ens, y_obs, h, jnp.ones(5),
                          jax.random.key(0))


class TestFilter:
    def _tracking_problem(self, t_len=120, seed=7):
        # lightly damped rotation observed in one coordinate
        th = 0.3
        a = 0.995 * np.array([[np.cos(th), -np.sin(th)],
                              [np.sin(th), np.cos(th)]])
        rng = np.random.default_rng(seed)
        x = np.array([2.0, 0.0])
        xs, ys = [], []
        for _ in range(t_len):
            x = a @ x + 0.02 * rng.normal(size=2)
            xs.append(x.copy())
            ys.append(x[0] + 0.3 * rng.normal())
        return a, np.asarray(xs), np.asarray(ys)

    @pytest.mark.parametrize("method", ["etkf", "stochastic"])
    def test_tracks_hidden_state(self, method):
        a, xs, ys = self._tracking_problem()
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(30, 2)))
        a_j = jnp.asarray(a)
        out = enkf_filter(
            x0, jnp.asarray(ys), lambda x: a_j @ x,
            jnp.asarray([[1.0, 0.0]]), 0.3**2,
            jax.random.key(1), method=method, q=0.02**2,
        )
        means = np.asarray(out["means"])
        # unobserved second component must be tracked too (the filter
        # infers it through the dynamics)
        rmse = np.sqrt(np.mean((means[20:] - xs[20:]) ** 2))
        obs_rmse = np.sqrt(np.mean((ys[20:] - xs[20:, 0]) ** 2))
        assert rmse < 0.5 * obs_rmse
        assert np.all(np.asarray(out["spread"]) > 0)

    def test_validates_method(self):
        with pytest.raises(ValueError, match="method"):
            enkf_filter(jnp.zeros((4, 2)), jnp.zeros((3, 1)),
                        lambda x: x, jnp.ones((1, 2)), 1.0,
                        jax.random.key(0), method="nope")


class TestEsmda:
    def test_linear_gaussian_posterior(self):
        # linear forward: ES-MDA (any valid alpha ladder) converges to
        # the exact Gaussian posterior in the large-ensemble limit
        rng = np.random.default_rng(5)
        d, p, n_ens = 3, 6, 6000
        g = rng.normal(size=(p, d))
        prior_mean = np.zeros(d)
        prior_cov = np.eye(d)
        r_val = 0.25
        theta_true = rng.normal(size=d)
        y_obs = g @ theta_true + np.sqrt(r_val) * rng.normal(size=p)

        prec = np.linalg.inv(prior_cov) + g.T @ g / r_val
        post_cov = np.linalg.inv(prec)
        post_mean = post_cov @ (g.T @ y_obs / r_val)

        x_ens = jnp.asarray(prior_mean
                            + rng.normal(size=(n_ens, d)))
        g_j = jnp.asarray(g)
        out = esmda(x_ens, lambda th: g_j @ th, jnp.asarray(y_obs),
                    r_val, jax.random.key(2), n_mda=4)
        np.testing.assert_allclose(
            np.asarray(out["mean"]), post_mean, atol=0.08)
        anom = np.asarray(out["ensemble"]) - np.asarray(out["mean"])
        got_cov = anom.T @ anom / (n_ens - 1)
        np.testing.assert_allclose(got_cov, post_cov, atol=0.1)
        # misfit must decrease monotonically on a linear problem
        mis = out["data_misfit"]
        assert mis[-1] < mis[0]
        assert np.all(np.diff(mis) < 1e-6)

    def test_alpha_validation(self):
        with pytest.raises(ValueError, match="sum"):
            esmda(jnp.zeros((10, 2)), lambda t: t, jnp.zeros(2), 1.0,
                  jax.random.key(0), alphas=[2.0, 3.0])

    @pytest.mark.slow
    def test_nonlinear_recovers_parameters(self):
        # mildly nonlinear forward: posterior mean lands near truth
        rng = np.random.default_rng(9)
        theta_true = np.array([1.2, -0.7])
        t_grid = jnp.linspace(0.0, 1.0, 24)

        def forward(th):
            return th[0] * jnp.exp(th[1] * t_grid)

        y_clean = np.asarray(forward(jnp.asarray(theta_true)))
        y_obs = y_clean + 0.01 * rng.normal(size=y_clean.shape)
        x_ens = jnp.asarray(
            np.array([1.0, -0.5]) + 0.3 * rng.normal(size=(400, 2)))
        out = esmda(x_ens, forward, jnp.asarray(y_obs), 0.01**2,
                    jax.random.key(3), n_mda=8)
        np.testing.assert_allclose(
            np.asarray(out["mean"]), theta_true, atol=0.05)
