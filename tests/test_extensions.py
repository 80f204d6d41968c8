"""GP regression + copula extension tests (reference roadmap items,
readme.md:34,49-54, never implemented there)."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.copula import GaussianCopula
from corrla_rs_tpu.ops.gp import GpRegressor, gp_kernel_eval


def test_gp_interpolates_smooth_function(rng):
    x = jnp.asarray(np.sort(rng.uniform(0, 6, 60))[:, None])
    y = jnp.sin(x[:, 0])
    gp = GpRegressor("rbf", 1.0, 1.0, 1e-6).fit(x, y, optimize_hypers=False)
    xq = jnp.linspace(0.3, 5.7, 41)[:, None]
    mean, var = gp.predict(xq)
    assert float(jnp.max(jnp.abs(mean - jnp.sin(xq[:, 0])))) < 1e-2
    assert float(jnp.max(var)) < 1e-2
    # far from data the variance grows
    m_far, v_far = gp.predict(jnp.array([[30.0]]))
    assert float(v_far[0]) > 0.5


def test_gp_hyperparameter_mle(rng):
    # noisy linear-ish data: MLE should find a sensible noise level
    x = jnp.asarray(rng.uniform(0, 4, 120)[:, None])
    y = jnp.sin(2.0 * x[:, 0]) + 0.05 * jnp.asarray(
        rng.standard_normal(120)
    )
    gp = GpRegressor("rbf", 2.0, 2.0, 1e-2).fit(x, y, optimize_hypers=True)
    assert 1e-4 < gp.noise_var < 0.05
    mean, _ = gp.predict(x)
    rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
    assert rmse < 0.08


@pytest.mark.parametrize("kernel", ["rbf", "matern52", "matern32"])
def test_gp_kernels_psd(rng, kernel):
    r = jnp.asarray(np.abs(rng.standard_normal((5, 5))))
    k = gp_kernel_eval(r, kernel, 1.0, 2.0)
    assert float(jnp.max(k)) <= 2.0 + 1e-9
    assert bool(jnp.all(k > 0))


def test_copula_recovers_dependence(rng):
    # correlated lognormal + gaussian marginals
    z = rng.multivariate_normal(
        [0, 0], [[1.0, 0.8], [0.8, 1.0]], size=4000
    )
    x = np.stack([np.exp(z[:, 0]), 2.0 * z[:, 1] + 5.0], axis=1)
    cop = GaussianCopula().fit(jnp.asarray(x))
    assert abs(float(cop.corr[0, 1]) - 0.8) < 0.05

    s = np.asarray(cop.sample(8000, key=1))
    # marginals preserved
    assert abs(np.median(s[:, 0]) - np.median(x[:, 0])) < 0.15
    assert abs(s[:, 1].mean() - x[:, 1].mean()) < 0.15
    # dependence preserved (rank correlation)
    from scipy.stats import spearmanr

    rho_true = spearmanr(x[:, 0], x[:, 1]).statistic
    rho_samp = spearmanr(s[:, 0], s[:, 1]).statistic
    assert abs(rho_true - rho_samp) < 0.06


def test_copula_independent(rng):
    x = jnp.asarray(rng.standard_normal((3000, 3)))
    cop = GaussianCopula().fit(x)
    off = np.asarray(cop.corr - np.eye(3))
    assert np.abs(off).max() < 0.06


def test_gp_log_marginal_likelihood_sane(rng):
    x = jnp.asarray(np.sort(rng.uniform(0, 4, 40))[:, None])
    y = jnp.sin(x[:, 0])
    gp_good = GpRegressor("rbf", 1.0, 1.0, 1e-4).fit(x, y, optimize_hypers=False)
    gp_bad = GpRegressor("rbf", 100.0, 1e-3, 10.0).fit(x, y, optimize_hypers=False)
    assert gp_good.log_marginal_likelihood() > gp_bad.log_marginal_likelihood()


@pytest.mark.slow
def test_bivariate_copula_all_families(rng):
    from corrla_rs_tpu.ops.copula import BivariateCopula
    from corrla_rs_tpu.ops.vine import kendall_tau

    # strongly dependent Gaussian pair as the fixture; each fixed family
    # must fit, sample, and reproduce the dependence strength (tau) it
    # captured from the data
    z = rng.standard_normal((4000, 2))
    x = np.stack([z[:, 0], 0.8 * z[:, 0] + 0.6 * z[:, 1]], axis=1)
    for fam in ("gaussian", "clayton", "gumbel", "frank"):
        cop = BivariateCopula(fam).fit(jnp.asarray(x))
        assert cop.fitted_family == fam
        s = cop.sample(4000, key=7)
        tau_s = float(kendall_tau(s[:, 0], s[:, 1]))
        assert abs(tau_s - cop.tau) < 0.08, (fam, tau_s, cop.tau)
        # marginals preserved (empirical quantile round-trip)
        np.testing.assert_allclose(
            np.median(np.asarray(s), axis=0), np.median(x, axis=0), atol=0.15
        )


@pytest.mark.slow
def test_bivariate_copula_auto_selects_gaussian(rng):
    from corrla_rs_tpu.ops.copula import BivariateCopula

    z = rng.standard_normal((5000, 2))
    x = np.stack([z[:, 0], 0.9 * z[:, 0] + np.sqrt(1 - 0.81) * z[:, 1]], axis=1)
    cop = BivariateCopula("auto").fit(jnp.asarray(x))
    assert cop.fitted_family in ("gaussian", "frank")  # symmetric families
    # log-density integrates sensibly: positive at the diagonal center for
    # positive dependence
    lp = float(cop.logpdf_uniform(jnp.asarray(0.5), jnp.asarray(0.5)))
    assert lp > 0.0


def test_bivariate_copula_validation(rng):
    from corrla_rs_tpu.ops.copula import BivariateCopula

    with pytest.raises(ValueError, match="family"):
        BivariateCopula("nope")
    z = rng.standard_normal((500, 2))
    x = np.stack([z[:, 0], -z[:, 0] + 0.2 * z[:, 1]], axis=1)  # negative dep
    with pytest.raises(ValueError, match="dependence of this sign"):
        BivariateCopula("clayton").fit(jnp.asarray(x))
    with pytest.raises(ValueError, match="samples"):
        BivariateCopula().fit(jnp.asarray(z[:, :1]))


def test_sparse_gp_matches_exact_when_inducing_all(rng):
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    x = np.sort(rng.uniform(0, 6, 60))[:, None]
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(60)
    hp = dict(length_scale=1.0, signal_var=1.0, noise_var=3e-3)
    gp = GpRegressor("rbf", **hp).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    sp = SparseGpRegressor("rbf", inducing=jnp.asarray(x), **hp).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    xq = jnp.asarray(np.linspace(0.3, 5.7, 31)[:, None])
    m1, v1 = gp.predict(xq)
    m2, v2 = sp.predict(xq)
    # inducing == all training points: SGPR collapses to the exact GP
    # (up to the jitter the two formulations place differently)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=1e-4)
    # ELBO lower-bounds the exact log marginal likelihood (up to the
    # differing jitter placements of the two formulations, ~1e-2 here)
    assert sp.elbo() <= gp.log_marginal_likelihood() + 0.01


@pytest.mark.slow
def test_sparse_gp_large_n(rng):
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    n = 8000
    x = np.sort(rng.uniform(0, 6, n))[:, None]
    y = np.sin(2 * x[:, 0]) + 0.1 * rng.standard_normal(n)
    sp = SparseGpRegressor("rbf", inducing=64, key=7).fit(
        jnp.asarray(x), jnp.asarray(y)
    )
    xq = np.linspace(0.3, 5.7, 50)[:, None]
    mean, var = sp.predict(jnp.asarray(xq))
    err = np.max(np.abs(np.asarray(mean) - np.sin(2 * xq[:, 0])))
    assert err < 0.05, err
    # predictive variance inflates outside the data range
    m_out, v_out = sp.predict(jnp.asarray([[12.0]]))
    assert float(v_out[0]) > 5 * float(np.median(np.asarray(var)))


def test_sparse_gp_refit_stable(rng):
    # review finding: refitting the same object compounded the fitted
    # variances by var(y) per call; inits now restart from the
    # constructor spec
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    x = np.sort(rng.uniform(0, 6, 300))[:, None]
    y = 50.0 * np.sin(x[:, 0]) + 1.0 * rng.standard_normal(300)
    sp = SparseGpRegressor("rbf", inducing=24, key=2)
    sp.fit(jnp.asarray(x), jnp.asarray(y))
    first = (sp.length_scale, sp.signal_var, sp.noise_var)
    sp.fit(jnp.asarray(x), jnp.asarray(y))
    second = (sp.length_scale, sp.signal_var, sp.noise_var)
    np.testing.assert_allclose(second, first, rtol=1e-6)
