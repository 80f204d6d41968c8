"""Polynomial chaos expansion (ops/pce) — extension tests.

Oracles: exact recovery of polynomial models (a degree-<=order model has
an exact finite PCE), analytic Ishigami Sobol' indices, and closed-form
moments of simple functions under the input measures.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.design import sobol_sample
from corrla_rs_tpu.ops.pce import PolynomialChaos, total_degree_multi_indices


def test_multi_index_count():
    # P = C(d + p, p)
    from math import comb

    for d, p in ((2, 3), (3, 5), (5, 2)):
        idx = total_degree_multi_indices(d, p)
        assert idx.shape == (comb(d + p, p), d)
        assert (idx.sum(axis=1) <= p).all()
        assert tuple(idx[0]) == (0,) * d


def test_exact_polynomial_recovery_uniform(rng):
    # f = 2 + 3 x1 + x2^2 - x1 x2 on a box: order-2 PCE is exact
    bounds = np.array([[-1.0, 2.0], [0.0, 3.0]])
    x = rng.uniform(bounds[:, 0], bounds[:, 1], (400, 2))

    def f(x):
        return 2 + 3 * x[:, 0] + x[:, 1] ** 2 - x[:, 0] * x[:, 1]

    pce = PolynomialChaos(2, "uniform", bounds).fit(jnp.asarray(x),
                                                    f(jnp.asarray(x)))
    assert pce.r2 > 1 - 1e-12
    xq = rng.uniform(bounds[:, 0], bounds[:, 1], (50, 2))
    np.testing.assert_allclose(
        np.asarray(pce.predict(jnp.asarray(xq))), np.asarray(f(xq)),
        rtol=1e-9,
    )
    # analytic moments: mean/var of f under U(box) via midpoint
    # quadrature (1000^2 midpoint grid: error O(1/N^2) ~ 1e-6 relative)
    def midgrid(lo, hi, n_pts=1000):
        return lo + (np.arange(n_pts) + 0.5) * (hi - lo) / n_pts

    g1 = midgrid(bounds[0, 0], bounds[0, 1])
    g2 = midgrid(bounds[1, 0], bounds[1, 1])
    gg = np.stack(np.meshgrid(g1, g2, indexing="ij"), axis=-1).reshape(-1, 2)
    vals = np.asarray(f(jnp.asarray(gg)))
    np.testing.assert_allclose(pce.mean, vals.mean(), rtol=1e-4)
    np.testing.assert_allclose(pce.var, vals.var(), rtol=1e-3)


@pytest.mark.slow
def test_ishigami_sobol_via_pce():
    bounds = np.array([[-np.pi, np.pi]] * 3)

    def ishigami(x):
        return (jnp.sin(x[:, 0]) + 7.0 * jnp.sin(x[:, 1]) ** 2
                + 0.1 * x[:, 2] ** 4 * jnp.sin(x[:, 0]))

    x = sobol_sample(bounds, 4096, key=1)
    pce = PolynomialChaos(9, "uniform", bounds).fit(x, ishigami(x))
    assert pce.r2 > 0.999
    out = pce.sobol_indices()
    s1_ref = np.array([0.3139, 0.4424, 0.0])
    st_ref = np.array([0.5576, 0.4424, 0.2437])
    np.testing.assert_allclose(np.asarray(out["s1"]), s1_ref, atol=0.01)
    np.testing.assert_allclose(np.asarray(out["st"]), st_ref, atol=0.01)


def test_gaussian_hermite_exact(rng):
    # f = x1 + x1^2 + 0.5 x2 with xi ~ N(mu_i, s_i^2): order-2 Hermite
    # PCE exact; Var = s1^2 + 2 s1^4 ... compute via the standardized form
    mean = np.array([1.0, -2.0])
    std = np.array([0.5, 2.0])
    x = mean + std * rng.standard_normal((500, 2))

    def f(x):
        return x[:, 0] + x[:, 0] ** 2 + 0.5 * x[:, 1]

    pce = PolynomialChaos(2, "gaussian", mean=mean, std=std).fit(
        jnp.asarray(x), f(jnp.asarray(x))
    )
    assert pce.r2 > 1 - 1e-12
    # analytic: E[f] = mu1 + mu1^2 + s1^2 + 0.5 mu2
    np.testing.assert_allclose(
        pce.mean, mean[0] + mean[0] ** 2 + std[0] ** 2 + 0.5 * mean[1],
        rtol=1e-10,
    )
    # Var[f] = Var[x1 + x1^2] + 0.25 Var[x2]
    #        = (1 + 2 mu1)^2 s1^2 + 2 s1^4 + 0.25 s2^2
    var_ref = (1 + 2 * mean[0]) ** 2 * std[0] ** 2 + 2 * std[0] ** 4 \
        + 0.25 * std[1] ** 2
    np.testing.assert_allclose(pce.var, var_ref, rtol=1e-9)


def test_validation(rng):
    with pytest.raises(ValueError, match="bounds"):
        PolynomialChaos(2, "uniform")
    with pytest.raises(ValueError, match="dist"):
        PolynomialChaos(2, "beta")
    pce = PolynomialChaos(5, "uniform", np.array([[0.0, 1.0]] * 3))
    with pytest.raises(ValueError, match="samples"):
        pce.fit(jnp.ones((10, 3)), jnp.ones(10))


def test_gaussian_partial_mean_std(rng):
    # review finding: a user-provided std must survive mean=None (was
    # silently overwritten), and mean with std=None must not crash
    mean = np.array([2.0, -1.0])
    std = np.array([0.3, 1.5])
    x = mean + std * rng.standard_normal((400, 2))

    def f(x):
        return x[:, 0] + 2.0 * x[:, 1]

    pce = PolynomialChaos(2, "gaussian", std=std).fit(
        jnp.asarray(x), f(jnp.asarray(x))
    )
    np.testing.assert_array_equal(pce._std, std)      # user std kept
    assert pce.r2 > 1 - 1e-10
    pce2 = PolynomialChaos(2, "gaussian", mean=mean).fit(
        jnp.asarray(x), f(jnp.asarray(x))
    )
    np.testing.assert_array_equal(pce2._mean, mean)
    assert pce2.r2 > 1 - 1e-10


def test_multi_index_scales_to_high_dim():
    import time
    from math import comb

    t0 = time.time()
    idx = total_degree_multi_indices(12, 4)
    assert idx.shape == (comb(16, 4), 12)
    # the old product-filter enumeration iterated 5^12 ~ 244M tuples here
    assert time.time() - t0 < 5.0


def test_integer_y_and_dim_validation(rng):
    bounds = np.array([[0.0, 1.0]] * 2)
    x = rng.uniform(0, 1, (100, 2))
    y = (10 * x[:, 0]).astype(np.int32)
    pce = PolynomialChaos(1, "uniform", bounds).fit(
        jnp.asarray(x), jnp.asarray(y)
    )
    assert np.isfinite(pce.r2)
    with pytest.raises(ValueError, match="dim"):
        total_degree_multi_indices(0, 3)


@pytest.mark.slow
def test_sparse_recovers_20d_model(rng):
    # VERDICT r2 item 8: a sparse 20-d model from n << full-basis
    # cardinality (C(22, 2) = 231 dense coefficients, n = 120 samples)
    d, n = 20, 120
    bounds = np.array([[-1.0, 1.0]] * d)
    x = rng.uniform(-1, 1, (n, d))

    def f(x):
        return (1.0 + 2.0 * x[:, 3] - 1.5 * x[:, 7] * x[:, 11]
                + 0.8 * x[:, 15] ** 2)

    pce = PolynomialChaos(2, "uniform", bounds).fit_sparse(
        jnp.asarray(x), f(jnp.asarray(x))
    )
    assert pce.loo_error < 1e-10, pce.loo_error
    assert pce.coeffs.shape[0] <= 12  # sparse support, not 231 terms
    xq = rng.uniform(-1, 1, (80, d))
    np.testing.assert_allclose(
        np.asarray(pce.predict(jnp.asarray(xq))), np.asarray(f(xq)),
        rtol=1e-7, atol=1e-9,
    )
    # oracle Sobol' indices: Var[x]=1/3, Var[xy]=1/9, Var[x^2]=4/45
    var_tot = 4 / 3 + 2.25 / 9 + 0.64 * 4 / 45
    out = pce.sobol_indices()
    s1 = np.asarray(out["s1"])
    st = np.asarray(out["st"])
    np.testing.assert_allclose(s1[3], (4 / 3) / var_tot, atol=1e-6)
    np.testing.assert_allclose(s1[15], (0.64 * 4 / 45) / var_tot,
                               atol=1e-6)
    np.testing.assert_allclose(st[7], (2.25 / 9) / var_tot, atol=1e-6)
    np.testing.assert_allclose(st[11], (2.25 / 9) / var_tot, atol=1e-6)
    inactive = [i for i in range(20) if i not in (3, 7, 11, 15)]
    np.testing.assert_allclose(st[inactive], 0.0, atol=1e-6)


@pytest.mark.slow
def test_sparse_degree_adaptive(rng):
    # cubic term in 5-d: the adaptive outer loop must grow past q=2
    d, n = 5, 90
    bounds = np.array([[-1.0, 1.0]] * d)
    x = rng.uniform(-1, 1, (n, d))

    def f(x):
        return 0.5 + x[:, 0] ** 3 - 2.0 * x[:, 2]

    pce = PolynomialChaos(2, "uniform", bounds).fit_sparse(
        jnp.asarray(x), f(jnp.asarray(x))
    )
    assert pce.loo_error < 1e-10
    assert int(np.asarray(pce._alpha).sum(axis=1).max()) == 3
    xq = rng.uniform(-1, 1, (50, d))
    np.testing.assert_allclose(
        np.asarray(pce.predict(jnp.asarray(xq))), np.asarray(f(xq)),
        rtol=1e-7, atol=1e-9,
    )


def test_sparse_max_order_cap(rng):
    d, n = 3, 60
    bounds = np.array([[-1.0, 1.0]] * d)
    x = rng.uniform(-1, 1, (n, d))
    y = x[:, 0] ** 4  # needs q=4; cap at 2 -> imperfect but finite
    pce = PolynomialChaos(2, "uniform", bounds).fit_sparse(
        jnp.asarray(x), jnp.asarray(y), max_order=2
    )
    assert int(np.asarray(pce._alpha).sum(axis=1).max()) <= 2
    assert np.isfinite(pce.loo_error)


@pytest.mark.slow
def test_sparse_gaussian_and_noise(rng):
    # noisy gaussian-input model: selection must stay parsimonious (LOO
    # guards against fitting the noise) and recover the signal terms
    d, n = 8, 200
    x = rng.standard_normal((n, d))
    y = 2.0 * x[:, 1] - x[:, 4] + 0.05 * rng.standard_normal(n)
    pce = PolynomialChaos(2, "gaussian").fit_sparse(
        jnp.asarray(x), jnp.asarray(y)
    )
    assert pce.r2 > 0.99
    assert pce.coeffs.shape[0] <= 40  # parsimonious (dense basis: 45)
    out = pce.sobol_indices()
    st = np.asarray(out["st"])
    assert st[1] > 0.7 and st[4] > 0.15
    assert np.all(st[[0, 2, 3, 5, 6, 7]] < 0.02)


def test_apc_data_driven_basis_orthonormal(rng):
    # skewed non-gaussian inputs: the aPC basis must be orthonormal
    # under the EMPIRICAL measure (Gram over training samples ~ I)
    from corrla_rs_tpu.ops.pce import PolynomialChaos

    x = rng.lognormal(0.0, 0.7, size=(4000, 2))
    y = 1.0 + x[:, 0] + 0.5 * x[:, 1] ** 2
    pce = PolynomialChaos(order=3, dist="data").fit(x, y)
    # per-dimension 1-d bases are orthonormal under the empirical
    # marginal BY CONSTRUCTION (machine-exact)
    from corrla_rs_tpu.ops.pce import _data_table
    import jax.numpy as jnp

    z = np.asarray(pce._standardize(jnp.asarray(x)))
    table = np.asarray(_data_table(
        jnp.asarray(z), jnp.asarray(pce._rec_a), jnp.asarray(pce._rec_sb),
        3))
    for j in range(2):
        g1 = table[:, j, :].T @ table[:, j, :] / x.shape[0]
        np.testing.assert_allclose(g1, np.eye(4), atol=1e-10)
    # tensor-product terms are orthonormal only in expectation under
    # independence — heavy lognormal tails make the empirical Gram
    # noisy, so assert loosely
    psi = np.asarray(pce._basis(np.asarray(x)), np.float64)
    gram = psi.T @ psi / x.shape[0]
    np.testing.assert_allclose(gram, np.eye(gram.shape[0]), atol=0.45)


@pytest.mark.slow
def test_apc_fits_lognormal_inputs_and_moments(rng):
    from corrla_rs_tpu.ops.pce import PolynomialChaos

    x = rng.lognormal(0.0, 0.5, size=(3000, 2))
    y = 2.0 + 3.0 * x[:, 0] - x[:, 1] + 0.25 * x[:, 0] * x[:, 1]
    pce = PolynomialChaos(order=2, dist="data").fit(x, y)
    assert pce.r2 > 1 - 1e-10              # exact polynomial model
    # orthonormal-basis moments match the sample moments of y
    assert pce.mean == pytest.approx(float(y.mean()), rel=1e-2)
    # var from sum-of-squares assumes exact product orthonormality,
    # which holds only asymptotically — a few % at this sample size
    assert pce.var == pytest.approx(float(y.var()), rel=0.05)
    # interaction term shows in total-order Sobol for both dims
    s = pce.sobol_indices()
    assert float(s["st"][0]) > float(s["s1"][0])


@pytest.mark.slow
def test_apc_degree_guard_and_sparse(rng):
    from corrla_rs_tpu.ops.pce import PolynomialChaos

    # binary inputs support only degree-1 orthonormal polynomials
    xb = rng.integers(0, 2, size=(200, 2)).astype(float)
    with pytest.raises(ValueError, match="up to degree 1"):
        PolynomialChaos(order=3, dist="data").fit(
            xb, xb[:, 0] + xb[:, 1])
    # sparse adaptive selection works on data-driven bases
    x = rng.lognormal(0.0, 0.4, size=(400, 6))
    y = 1.0 + 2.0 * x[:, 1] + 0.5 * x[:, 3] ** 2
    pce = PolynomialChaos(order=2, dist="data").fit_sparse(x, y)
    assert pce.loo_error < 1e-8
    s = pce.sobol_indices()
    st = np.asarray(s["st"])
    assert st[1] > 0.1 and st[3] > 0.05
    assert np.all(st[[0, 2, 4, 5]] < 1e-6)


def test_fit_quadrature_uniform_exact_polynomial():
    """Spectral projection on uniform inputs: a polynomial model within
    the basis is recovered EXACTLY (coefficients -> analytic mean/var/
    Sobol), no regression conditioning involved."""
    import jax.numpy as jnp

    from corrla_rs_tpu.ops.pce import PolynomialChaos

    bounds = np.array([[-1.0, 1.0], [0.0, 2.0]])

    def model(x):
        return 2.0 + 3.0 * x[0] + x[0] * x[1] + 0.5 * x[1] ** 2

    pce = PolynomialChaos(order=2, dist="uniform", bounds=bounds)
    pce.fit_quadrature(model, level=3)
    assert pce.r2 > 1.0 - 1e-12
    # oracle: dense MC on the closed-form model
    rng = np.random.default_rng(0)
    xs = rng.uniform(bounds[:, 0], bounds[:, 1], size=(400000, 2))
    ys = 2.0 + 3.0 * xs[:, 0] + xs[:, 0] * xs[:, 1] + 0.5 * xs[:, 1] ** 2
    assert pce.mean == pytest.approx(float(ys.mean()), abs=5e-3)
    assert pce.var == pytest.approx(float(ys.var()), rel=5e-3)
    # prediction is the model itself
    xq = jnp.asarray(rng.uniform(bounds[:, 0], bounds[:, 1], (50, 2)))
    np.testing.assert_allclose(
        np.asarray(pce.predict(xq)),
        np.asarray(jnp.asarray([model(q) for q in xq])), atol=1e-10)


@pytest.mark.slow
def test_fit_quadrature_gaussian_matches_regression():
    """Gaussian inputs: projection and regression agree on a smooth
    model; projection needs mean/std up front."""
    import jax
    import jax.numpy as jnp

    from corrla_rs_tpu.ops.pce import PolynomialChaos

    mean = np.array([1.0, -0.5])
    std = np.array([0.5, 2.0])

    def model(x):
        return jnp.sin(0.3 * x[0]) + 0.1 * x[1] ** 2

    proj = PolynomialChaos(order=4, dist="gaussian", mean=mean, std=std)
    proj.fit_quadrature(model, level=4)

    rng = np.random.default_rng(1)
    xs = jnp.asarray(mean + std * rng.standard_normal((4000, 2)))
    ys = jax.vmap(model)(xs)
    reg = PolynomialChaos(order=4, dist="gaussian", mean=mean,
                          std=std).fit(xs, ys)
    np.testing.assert_allclose(np.asarray(proj.coeffs),
                               np.asarray(reg.coeffs), atol=2e-3)
    assert proj.mean == pytest.approx(float(ys.mean()), abs=0.01)

    with pytest.raises(ValueError, match="mean"):
        PolynomialChaos(order=2, dist="gaussian").fit_quadrature(model)
    with pytest.raises(ValueError, match="data"):
        PolynomialChaos(order=2, dist="data").fit_quadrature(model)
