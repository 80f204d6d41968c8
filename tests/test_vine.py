"""C-vine copula tests (reference roadmap item readme.md:49-54)."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.vine import (
    FAMILIES,
    _H,
    _HINV,
    _LOGPDF,
    _frank_tau,
    _frank_theta_from_tau,
    CVineCopula,
    kendall_tau,
)

PARAMS = {"gaussian": 0.6, "clayton": 2.0, "gumbel": 2.0, "frank": 4.0,
          "independent": 0.0,
          "t3": 0.6, "t5": 0.6, "t8": 0.6, "t15": 0.6}


@pytest.mark.slow
def test_hinv_roundtrip_all_families(rng):
    from corrla_rs_tpu.ops.vine import _split_rotation

    u = jnp.asarray(rng.uniform(0.02, 0.98, 400))
    v = jnp.asarray(rng.uniform(0.02, 0.98, 400))
    for fam in FAMILIES:   # includes the 90/180/270 rotations
        th = PARAMS[_split_rotation(fam)[0]]
        w = _H[fam](u, v, th)
        u2 = _HINV[fam](w, v, th)
        assert float(jnp.max(jnp.abs(u2 - u))) < 1e-9, fam


@pytest.mark.slow
def test_pdf_is_derivative_of_h(rng):
    # c(u, v) = d h(u|v) / d u — ties the log-pdfs used for family
    # selection to the h-functions used for conditioning/sampling
    u = jnp.asarray(rng.uniform(0.05, 0.95, 300))
    v = jnp.asarray(rng.uniform(0.05, 0.95, 300))
    eps = 1e-6
    for fam in ("gaussian", "clayton", "gumbel", "frank", "t5"):
        th = PARAMS[fam]
        dh = (_H[fam](u + eps, v, th) - _H[fam](u - eps, v, th)) / (2 * eps)
        c = jnp.exp(_LOGPDF[fam](u, v, th))
        rel = jnp.max(jnp.abs(c - dh) / jnp.maximum(jnp.abs(dh), 1e-3))
        assert float(rel) < 1e-6, fam


def test_frank_tau_inversion():
    for tau in (0.2, 0.5, 0.8, -0.4):
        th = _frank_theta_from_tau(jnp.asarray(tau))
        assert abs(float(_frank_tau(jnp.abs(th))) * np.sign(tau) - tau) < 1e-3


def test_kendall_tau_known():
    x = np.arange(50.0)
    np.testing.assert_allclose(float(kendall_tau(x, x)), 1.0)
    np.testing.assert_allclose(float(kendall_tau(x, -x)), -1.0)


def test_vine_recovers_clayton_pair(rng):
    # conditional-method Clayton sample -> the pair fit should pick a
    # lower-tail-dependent family with roughly the right strength
    th_true = 2.0   # tau = th/(th+2) = 0.5
    n = 1200
    u1 = jnp.asarray(rng.uniform(0.001, 0.999, n))
    w = jnp.asarray(rng.uniform(0.001, 0.999, n))
    u2 = _HINV["clayton"](w, u1, th_true)
    x = np.stack([np.asarray(u1), np.asarray(u2)], axis=1)
    vc = CVineCopula().fit(x)
    fam, th = vc.pairs[0][0]
    assert fam == "clayton"
    assert abs(th - th_true) < 0.5
    s = np.asarray(vc.sample(1500, key=3))
    tau_s = float(kendall_tau(s[:1500, 0], s[:1500, 1]))
    assert abs(tau_s - 0.5) < 0.09


@pytest.mark.slow
def test_vine_3d_gaussian_dependence(rng):
    cov = np.array([[1.0, 0.7, 0.3], [0.7, 1.0, 0.5], [0.3, 0.5, 1.0]])
    x = rng.multivariate_normal([0.0, 1.0, -2.0], cov, size=1500)
    vc = CVineCopula().fit(x)
    s = np.asarray(vc.sample(4000, key=1))
    for i, j in [(0, 1), (0, 2), (1, 2)]:
        td = float(kendall_tau(x[:, i], x[:, j]))
        ts = float(kendall_tau(s[:, i], s[:, j]))
        assert abs(td - ts) < 0.06, (i, j, td, ts)
    # empirical marginals preserved
    np.testing.assert_allclose(
        np.median(s, axis=0), np.median(x, axis=0), atol=0.15
    )


@pytest.mark.slow
def test_vine_independent_or_negligible(rng):
    # On independent data the AIC comparison either selects the
    # independence copula or fits a negligible dependence (sample tau on
    # n=800 iid draws is ~N(0, 0.024) — a 2-sigma draw legitimately fits
    # a tiny copula; both outcomes are correct behavior).
    x = rng.standard_normal((800, 2))
    vc = CVineCopula().fit(x)
    fam, th = vc.pairs[0][0]
    assert fam == "independent" or abs(th) < 0.15, (fam, th)
    # and a decisively independent case (penalty beats ll at tau ~ 0)
    n = 4000
    xi = np.stack([np.arange(n) % 2, (np.arange(n) // 2) % 2], axis=1)
    xi = xi + 0.01 * np.random.default_rng(7).standard_normal((n, 2))
    vc2 = CVineCopula().fit(xi)
    fam2, th2 = vc2.pairs[0][0]
    assert fam2 == "independent" or abs(th2) < 0.1, (fam2, th2)


def test_t_ppf_cdf_match_scipy():
    from scipy import stats

    from corrla_rs_tpu.ops.vine import _t_cdf, _t_ppf

    u = jnp.asarray(np.linspace(0.001, 0.999, 57))
    for nu in (3.0, 5.0, 8.0, 15.0, 16.0):  # 16 = nu+1 used inside h
        x = np.asarray(_t_ppf(u, nu))
        np.testing.assert_allclose(x, stats.t.ppf(np.asarray(u), nu),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(_t_cdf(jnp.asarray(x), nu)),
                                   np.asarray(u), rtol=0, atol=1e-12)


@pytest.mark.slow
def test_t_ppf_gradient_is_implicit_derivative():
    # custom JVP: d ppf/du = 1 / pdf(ppf(u)) — check against central diff
    import jax

    from corrla_rs_tpu.ops.vine import _t_ppf

    g = jax.grad(lambda u: _t_ppf(u, 5.0))
    for u0 in (0.1, 0.37, 0.5, 0.92):
        eps = 1e-6
        fd = (float(_t_ppf(jnp.asarray(u0 + eps), 5.0))
              - float(_t_ppf(jnp.asarray(u0 - eps), 5.0))) / (2 * eps)
        assert abs(float(g(jnp.asarray(u0))) - fd) < 1e-4 * max(abs(fd), 1.0)


@pytest.mark.slow
def test_vine_recovers_t_pair(rng):
    # bivariate t_3 has symmetric tail dependence in BOTH tails — gaussian
    # (zero tail dependence) and the one-tail archimedeans should lose the
    # AIC race to the t grid on strongly tail-dependent elliptical data
    from corrla_rs_tpu.ops.vine import _split_rotation, _t_cdf

    nu, rho, n = 3.0, 0.5, 4000
    z = rng.standard_normal((n, 2)) @ np.linalg.cholesky(
        np.array([[1.0, rho], [rho, 1.0]])).T
    w = rng.chisquare(nu, size=(n, 1))
    t_xy = z / np.sqrt(w / nu)
    u = np.asarray(_t_cdf(jnp.asarray(t_xy), nu))
    vc = CVineCopula().fit(u)
    fam, th = vc.pairs[0][0]
    assert _split_rotation(fam)[0] in ("t3", "t5"), (fam, th)
    assert abs(th - rho) < 0.1, (fam, th)
    # tau round-trips through sampling
    s = np.asarray(vc.sample(4000, key=11))
    tau_true = 2.0 / np.pi * np.arcsin(rho)
    assert abs(float(kendall_tau(s[:, 0], s[:, 1])) - tau_true) < 0.06


@pytest.mark.slow
def test_mle_refine_improves_loglik(rng):
    # frank tau inversion goes through a Debye-function bisection with
    # grid error; the MLE refinement must never do worse, and its
    # gradient must vanish at the refined theta
    import jax

    from corrla_rs_tpu.ops.vine import _mle_refine_kernel

    th_true = 6.0
    n = 3000
    u1 = jnp.asarray(rng.uniform(0.001, 0.999, n))
    w = jnp.asarray(rng.uniform(0.001, 0.999, n))
    u2 = _HINV["frank"](w, u1, th_true)

    from corrla_rs_tpu.ops.vine import _theta_from_tau, kendall_tau

    tau = float(kendall_tau(u1, u2))
    th0 = _theta_from_tau("frank", tau)
    ll0 = float(jnp.sum(_LOGPDF["frank"](u1, u2, th0)))
    th_hat, ll_hat = _mle_refine_kernel(u1, u2, jnp.asarray(th0), "frank")
    th_hat, ll_hat = float(th_hat), float(ll_hat)
    assert ll_hat >= ll0 - 1e-9
    assert abs(th_hat - th_true) < 0.35
    # stationarity: d loglik / d theta ~ 0 at the refined value
    g = jax.grad(
        lambda t: jnp.sum(_LOGPDF["frank"](u1, u2, t))
    )(jnp.asarray(th_hat))
    assert abs(float(g)) < 0.5   # nats per unit theta over 3000 samples


def test_mle_refine_recovers_clayton_theta(rng):
    from corrla_rs_tpu.ops.vine import _mle_refine_kernel

    th_true = 3.0
    n = 4000
    u1 = jnp.asarray(rng.uniform(0.001, 0.999, n))
    w = jnp.asarray(rng.uniform(0.001, 0.999, n))
    u2 = _HINV["clayton"](w, u1, th_true)
    th_hat, _ = _mle_refine_kernel(u1, u2, jnp.asarray(2.0), "clayton")
    assert abs(float(th_hat) - th_true) < 0.25


@pytest.mark.slow
def test_refine_through_public_surfaces(rng):
    from corrla_rs_tpu.ops.copula import BivariateCopula

    th_true = 2.5
    n = 2000
    u1 = jnp.asarray(rng.uniform(0.001, 0.999, n))
    w = jnp.asarray(rng.uniform(0.001, 0.999, n))
    u2 = _HINV["gumbel"](w, u1, th_true)
    x = np.stack([np.asarray(u1), np.asarray(u2)], axis=1)

    m = BivariateCopula("gumbel", refine=True).fit(x)
    assert abs(m.theta - th_true) < 0.3
    vc = CVineCopula(refine=True).fit(x)
    fam, th = vc.pairs[0][0]
    assert fam in ("gumbel", "t3")    # gumbel expected; t3 a near-miss
    s = np.asarray(vc.sample(3000, key=2))
    tau_true = 1.0 - 1.0 / th_true
    assert abs(float(kendall_tau(s[:, 0], s[:, 1])) - tau_true) < 0.07
