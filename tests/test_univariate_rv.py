"""Univariate RV + MLE parity tests (reference univariate_rv.rs:500-606)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from corrla_rs_tpu.ops.univariate_rv import (
    BetaRv,
    ExponentialRv,
    KdeRv,
    NormalRv,
    build_kde,
)


def test_normal_pdf_cdf_oracle():
    rv = NormalRv(2.0, 3.0)
    x = np.linspace(-5, 9, 21)
    np.testing.assert_allclose(
        np.asarray(rv.pdf(x)), sps.norm(2.0, 3.0).pdf(x), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(rv.cdf(x)), sps.norm(2.0, 3.0).cdf(x), rtol=1e-10
    )


def test_normal_mlfit():
    # Parity with test_normal_rv (univariate_rv.rs:506-523): fit N(5.25, 10)
    # samples, recover sample stats at 1e-3.
    rv_true = NormalRv(5.25, 10.0)
    s = rv_true.sample(4000, key=0)
    rv = NormalRv(1.0, 1.0).mlfit(s, method=1, key=1)
    assert abs(rv.mu - float(jnp.mean(s))) < 1e-3
    assert abs(rv.std - float(jnp.std(s))) < 1e-3


@pytest.mark.slow
def test_normal_mlfit_bfgs_and_sd():
    s = NormalRv(-3.0, 2.0).sample(20000, key=2)
    rv2 = NormalRv(1.0, 1.0).mlfit(s, method=2)
    assert abs(rv2.mu - float(jnp.mean(s))) < 1e-3
    rv0 = NormalRv(1.0, 1.0).mlfit(s, method=0)
    assert abs(rv0.mu - float(jnp.mean(s))) < 0.2


# The reference's 7-case matrix (univariate_rv.rs:526-561). Two
# representative cases (interior + u-shaped-ish) run in the default lane;
# the full matrix runs with -m slow.
BETA_MATRIX = [
    pytest.param(1.0, 1.0, 0.0, 1.0, marks=pytest.mark.slow),
    (2.0, 2.0, 0.0, 100.0),
    (0.25, 0.75, 2.0, 7.0),
    pytest.param(1.25, 2.75, 0.2, 0.3, marks=pytest.mark.slow),
    pytest.param(0.25, 2.75, 0.0, 1.0, marks=pytest.mark.slow),
    pytest.param(2.75, 0.25, 0.0, 1.0, marks=pytest.mark.slow),
    pytest.param(0.25, 0.25, 0.0, 1.0, marks=pytest.mark.slow),
]


@pytest.mark.parametrize("alpha,beta,lo,hi", BETA_MATRIX)
def test_beta_moment_fit(alpha, beta, lo, hi):
    # Parity with test_beta_rv (univariate_rv.rs:526-561): 7-case matrix,
    # method-of-moments fit recovers (alpha, beta) at 2e-1.
    rv_true = BetaRv(alpha, beta, lo, hi)
    s = rv_true.sample(40000, key=3)
    rv = BetaRv(1.0, 1.0, lo, hi).mlfit(s, method=None)
    assert abs(rv.alpha - alpha) < 2e-1
    assert abs(rv.beta - beta) < 2e-1
    # resampling from the fit matches moments (univariate_rv.rs:556-560)
    s2 = rv.sample(40000, key=4)
    tol = 7e-2 * (hi - lo)
    assert abs(float(jnp.mean(s2)) - float(jnp.mean(s))) < tol
    assert abs(float(jnp.std(s2)) - float(jnp.std(s))) < tol


def test_beta_pdf_cdf_oracle():
    rv = BetaRv(2.5, 1.5, 1.0, 3.0)
    x = np.linspace(1.01, 2.99, 17)
    ref = sps.beta(2.5, 1.5, loc=1.0, scale=2.0)
    # parity note: the reference pdf is UNNORMALIZED w.r.t. the interval
    # width (no 1/(hi-lo) jacobian, univariate_rv.rs:297-306); scipy's
    # includes it.
    np.testing.assert_allclose(
        np.asarray(rv.pdf(x)) / 2.0, ref.pdf(x), rtol=1e-8
    )
    np.testing.assert_allclose(np.asarray(rv.cdf(x)), ref.cdf(x), rtol=1e-6)


def test_uniform_is_beta11():
    # Parity with test_uniform_rv (univariate_rv.rs:565-570).
    s = BetaRv(1.0, 1.0, 0.0, 1.0).sample(10000, key=5)
    assert abs(float(jnp.mean(s)) - 0.5) < 1e-2


def test_exponential():
    rv = ExponentialRv(2.0)
    x = np.linspace(0.01, 4.0, 11)
    np.testing.assert_allclose(
        np.asarray(rv.pdf(x)), sps.expon(scale=0.5).pdf(x), rtol=1e-10
    )
    s = rv.sample(10000, key=6)
    fit = ExponentialRv(1.0).mlfit(s, method=2)
    assert abs(fit.lam - 2.0) < 5e-2


def test_kde_fixed_bandwidth_smoke():
    # Default-lane KDE rep: fixed bandwidth (no CV), pdf normalizes and
    # sampling reproduces the support moments. The bandwidth-selection
    # parity tests (est_bandwidth / build_kde) run with -m slow.
    support_s = NormalRv(5.25, 10.0).sample(400, key=7)
    kde = KdeRv(4.0, support_s)
    xg = np.linspace(-40, 50, 801)
    pdf = np.asarray(kde.pdf(xg))
    assert abs(np.trapezoid(pdf, xg) - 1.0) < 1e-3
    ks = kde.sample(4000, key=9)
    assert abs(float(jnp.mean(ks)) - float(jnp.mean(support_s))) < 9e-1


@pytest.mark.slow
def test_kde():
    # Parity with test_kde_rv (univariate_rv.rs:573-605).
    rv_known = NormalRv(5.25, 10.0)
    support_s = rv_known.sample(400, key=7)
    test_s = rv_known.sample(400, key=8)
    kde = KdeRv(1.0, support_s)
    bw = kde.est_bandwidth(test_s, method=2)
    assert 0.5 < bw < 50.0
    kde.bandwidth = bw
    ks = kde.sample(10000, key=9)
    assert abs(float(jnp.mean(ks)) - float(jnp.mean(support_s))) < 9e-1
    assert abs(float(jnp.std(ks)) - float(jnp.std(support_s))) < 5.0
    # pdf integrates to ~1
    xg = np.linspace(-40, 50, 2001)
    pdf = np.asarray(kde.pdf(xg))
    assert abs(np.trapezoid(pdf, xg) - 1.0) < 1e-3


@pytest.mark.slow
def test_build_kde():
    support_s = NormalRv(5.25, 10.0).sample(400, key=10)
    auto = build_kde(1.0, support_s, n_iter=2, method=2, key=11)
    ks = auto.sample(20000, key=12)
    assert abs(float(jnp.mean(ks)) - float(jnp.mean(support_s))) < 9e-1
    assert abs(float(jnp.std(ks)) - float(jnp.std(support_s))) < 3.0
