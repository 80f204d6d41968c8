"""Shapley effects: closed-form linear-Gaussian oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.shapley import shapley_effects, shapley_effects_linear


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
