"""Shapley effects: closed-form linear-Gaussian oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.shapley import (
    shapley_effects,
    shapley_effects_linear,
    shapley_effects_quadrature,
)


def test_linear_independent_equals_sobol():
    """Independent inputs, additive model: Shapley == first-order Sobol
    (= beta_i^2 sig_i^2 / Var)."""
    beta = np.array([1.0, 2.0, 0.5])
    sig2 = np.array([1.0, 0.25, 4.0])
    sh = shapley_effects_linear(beta, np.diag(sig2))
    truth = beta ** 2 * sig2
    truth = truth / truth.sum()
    np.testing.assert_allclose(sh, truth, rtol=1e-12)
    assert sh.sum() == pytest.approx(1.0, abs=1e-12)


def test_linear_correlated_splits_shared_variance():
    """Two perfectly symmetric correlated inputs: the shared variance is
    split equally; a third independent input keeps its own share."""
    rho = 0.8
    cov = np.array([[1.0, rho, 0.0],
                    [rho, 1.0, 0.0],
                    [0.0, 0.0, 1.0]])
    beta = np.array([1.0, 1.0, 1.0])
    sh = shapley_effects_linear(beta, cov)
    assert sh[0] == pytest.approx(sh[1], abs=1e-12)  # symmetry
    assert sh.sum() == pytest.approx(1.0, abs=1e-12)
    # var contributions: pair block 2+2rho=3.6, solo 1 -> solo share
    assert sh[2] == pytest.approx(1.0 / 4.6, abs=1e-12)


def test_mc_matches_closed_form():
    rho = 0.6
    cov = np.array([[1.0, rho, 0.2],
                    [rho, 2.0, 0.0],
                    [0.2, 0.0, 0.5]])
    beta = np.array([1.0, -0.7, 1.5])
    truth = shapley_effects_linear(beta, cov)

    def model(x):
        return x @ jnp.asarray(beta)

    sh = shapley_effects(model, np.zeros(3), cov, n_outer=512,
                         n_inner=128, key=0)
    np.testing.assert_allclose(np.asarray(sh), truth, atol=0.03)
    assert float(jnp.sum(sh)) == pytest.approx(1.0, abs=0.05)


@pytest.mark.slow
def test_nonlinear_symmetric_model():
    """Ishigami-free sanity: x0^2 + x1^2 with iid inputs -> equal
    effects; an inert input gets ~0."""
    cov = np.eye(3)

    def model(x):
        return x[:, 0] ** 2 + x[:, 1] ** 2

    # the estimator variance is a variance-of-variance: n_outer drives it
    sh = np.asarray(shapley_effects(model, np.zeros(3), cov,
                                    n_outer=8192, n_inner=64, key=1))
    assert sh[0] == pytest.approx(sh[1], abs=0.08)
    assert abs(sh[2]) < 0.02
    assert sh.sum() == pytest.approx(1.0, abs=0.05)


def test_validation():
    with pytest.raises(ValueError, match="2\\^d"):
        shapley_effects(lambda x: x[:, 0], np.zeros(20), np.eye(20))


def test_quadrature_linear_oracle():
    """GH quadrature is exact for polynomials: a linear model's Shapley,
    S1 and ST all equal the closed form, at machine precision, at tiny
    n_quad."""
    beta = np.array([1.0, 2.0, 0.5])
    sig = np.array([1.0, 0.5, 2.0])
    truth = shapley_effects_linear(beta, np.diag(sig ** 2))

    def model(x):
        return x @ jnp.asarray(beta)

    out = shapley_effects_quadrature(model, np.zeros(3), sig, n_quad=4)
    np.testing.assert_allclose(out["shapley"], truth, atol=1e-10)
    # additive model: S1 == ST == Shapley
    np.testing.assert_allclose(out["s1"], truth, atol=1e-10)
    np.testing.assert_allclose(out["st"], truth, atol=1e-10)
    assert out["var"] == pytest.approx(float(beta ** 2 @ sig ** 2),
                                       rel=1e-12)


def test_quadrature_interaction_sandwich():
    """Quadratic model with an interaction: exact values satisfy Owen's
    sandwich strictly, shares sum to 1, Shapley splits the interaction
    variance equally between its two participants."""
    def model(x):
        return x[:, 0] + x[:, 0] * x[:, 1] + 0.5 * x[:, 2]

    out = shapley_effects_quadrature(
        model, np.zeros(3), np.ones(3), n_quad=6)
    s1, st, sh = out["s1"], out["st"], out["shapley"]
    assert np.all(s1 <= sh + 1e-12) and np.all(sh <= st + 1e-12)
    assert sh.sum() == pytest.approx(1.0, abs=1e-12)
    # analytic ANOVA: V = 1 (x0) + 1 (x0x1) + 0.25 (x2) = 2.25;
    # Shapley gives each interaction participant half of the 1.0
    np.testing.assert_allclose(sh, [1.5 / 2.25, 0.5 / 2.25, 0.25 / 2.25],
                               atol=1e-10)
    np.testing.assert_allclose(s1, [1.0 / 2.25, 0.0, 0.25 / 2.25],
                               atol=1e-10)
    np.testing.assert_allclose(st, [2.0 / 2.25, 1.0 / 2.25, 0.25 / 2.25],
                               atol=1e-10)


def test_quadrature_smooth_convergence_and_mc_agreement():
    """Non-polynomial smooth model: n_quad=12 vs n_quad=24 agree
    (spectral convergence) and the MC estimator scatters around the
    quadrature value."""
    def model(x):
        return jnp.exp(0.4 * x[:, 0]) * jnp.sin(x[:, 1]) + 0.3 * x[:, 2]

    a = shapley_effects_quadrature(model, np.zeros(3), np.ones(3),
                                   n_quad=12)
    b = shapley_effects_quadrature(model, np.zeros(3), np.ones(3),
                                   n_quad=24)
    np.testing.assert_allclose(a["shapley"], b["shapley"], atol=1e-8)
    np.testing.assert_allclose(a["s1"], b["s1"], atol=1e-8)
    np.testing.assert_allclose(a["st"], b["st"], atol=1e-8)
    mc = np.asarray(shapley_effects(model, np.zeros(3), np.eye(3),
                                    n_outer=2048, n_inner=64, key=3))
    np.testing.assert_allclose(mc, b["shapley"], atol=0.08)


def test_quadrature_custom_rules_uniform():
    """Gauss-Legendre rules on U(-1,1)^3 inputs: additive quadratic
    model has analytic ANOVA (Var[x^2] = 4/45, Var[x] = 1/3)."""
    def model(x):
        return x[:, 0] ** 2 + 2.0 * x[:, 1]

    xg, wg = np.polynomial.legendre.leggauss(8)
    out = shapley_effects_quadrature(model, rules=[(xg, wg)] * 3)
    v0, v1 = 4.0 / 45.0, 4.0 / 3.0
    truth = np.array([v0, v1, 0.0]) / (v0 + v1)
    np.testing.assert_allclose(out["shapley"], truth, atol=1e-12)
    np.testing.assert_allclose(out["s1"], truth, atol=1e-12)
    np.testing.assert_allclose(out["st"], truth, atol=1e-12)
    assert out["var"] == pytest.approx(v0 + v1, rel=1e-12)
    with pytest.raises(ValueError, match="nodes vs"):
        shapley_effects_quadrature(model, rules=[(xg, wg[:-1])] * 3)


def test_quadrature_validation():
    with pytest.raises(ValueError, match="INDEPENDENT"):
        shapley_effects_quadrature(
            lambda x: x[:, 0], np.zeros(2),
            np.array([[1.0, 0.5], [0.5, 1.0]]))
    with pytest.raises(ValueError, match="too large"):
        shapley_effects_quadrature(
            lambda x: x[:, 0], np.zeros(8), np.ones(8), n_quad=16)
