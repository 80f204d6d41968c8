"""Bayesian optimization: acquisition closed forms + optimizer oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from corrla_rs_tpu.ops.bayes_opt import (
    BayesOpt,
    bayes_opt_minimize,
    expected_improvement,
    lower_confidence_bound,
    probability_of_improvement,
)


def test_acquisition_closed_forms():
    mean, var, best, xi = 0.3, 0.25, 0.5, 0.0
    sd = np.sqrt(var)
    z = (best - mean) / sd
    ei_ref = (best - mean) * stats.norm.cdf(z) + sd * stats.norm.pdf(z)
    assert float(expected_improvement(
        jnp.asarray(mean), jnp.asarray(var), best, xi)) == pytest.approx(
            ei_ref, rel=1e-10)
    assert float(probability_of_improvement(
        jnp.asarray(mean), jnp.asarray(var), best, xi)) == pytest.approx(
            stats.norm.cdf(z), rel=1e-10)
    assert float(lower_confidence_bound(
        jnp.asarray(mean), jnp.asarray(var), 2.0)) == pytest.approx(
            -(mean - 2.0 * sd), rel=1e-10)
    # EI is ~0 far above the incumbent, positive below it (xi=0)
    assert float(expected_improvement(
        jnp.asarray(5.0), jnp.asarray(1e-6), 0.0, xi=0.0)) < 1e-12
    assert float(expected_improvement(
        jnp.asarray(-1.0), jnp.asarray(1e-6), 0.0, xi=0.0)) == \
        pytest.approx(1.0, abs=1e-6)


def _quad(x):
    # global min at (0.3, -0.4), value -1
    return (float((x[0] - 0.3) ** 2 + 2.0 * (x[1] + 0.4) ** 2) - 1.0)


@pytest.mark.slow
def test_minimize_quadratic_2d():
    res = bayes_opt_minimize(_quad, [[-1, 1], [-1, 1]], n_init=8,
                             n_iters=12, key=0)
    assert res.y_best < -0.98
    np.testing.assert_allclose(np.asarray(res.x_best), [0.3, -0.4],
                               atol=0.1)
    assert res.n_evals == 20


def _branin(x):
    a, b, c = 1.0, 5.1 / (4 * np.pi ** 2), 5 / np.pi
    r, s, t = 6.0, 10.0, 1 / (8 * np.pi)
    x1, x2 = float(x[0]), float(x[1])
    return (a * (x2 - b * x1 ** 2 + c * x1 - r) ** 2
            + s * (1 - t) * np.cos(x1) + s)


@pytest.mark.slow
def test_branin_beats_random_search():
    """Equal budget: BO's best value must beat pure random search by a
    clear margin (Branin global min = 0.3979)."""
    bounds = [[-5.0, 10.0], [0.0, 15.0]]
    res = bayes_opt_minimize(_branin, bounds, n_init=10, n_iters=18,
                             key=1)
    rng = np.random.default_rng(2)
    xr = rng.uniform([-5, 0], [10, 15], size=(28, 2))
    y_rand = min(_branin(x) for x in xr)
    assert res.y_best < y_rand
    assert res.y_best < 0.6  # near the global optimum (0.3979)


def test_ask_tell_interface_and_validation():
    bo = BayesOpt([[0, 1]], acquisition="lcb", key=3)
    with pytest.raises(ValueError, match="observations"):
        bo.ask()
    bo.tell(np.array([[0.1], [0.9]]), [1.0, 2.0])
    x = bo.ask()
    assert x.shape == (1,)
    assert 0.0 <= float(x[0]) <= 1.0
    xs = bo.ask(n_points=3)
    assert xs.shape == (3, 1)
    # distinct suggestions
    assert len({round(float(v), 6) for v in xs[:, 0]}) == 3
    with pytest.raises(ValueError, match="bounds"):
        BayesOpt([[0, 1, 2]])
    with pytest.raises(ValueError, match="acquisition"):
        BayesOpt([[0, 1]], acquisition="nope")
    with pytest.raises(ValueError, match="matching"):
        bo.tell(np.zeros((2, 1)), [1.0])


def test_padded_gp_fit_is_exact():
    """pad_to= masking must reproduce the unpadded posterior, NLML and
    MLE hyperparameters exactly (identity-row decoupling)."""
    from corrla_rs_tpu.ops.gp import GpRegressor

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (23, 2)))
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0])
                    + 0.1 * rng.standard_normal(23))
    g1 = GpRegressor().fit(x, y)
    g2 = GpRegressor().fit(x, y, pad_to=32)
    xq = jnp.asarray(rng.uniform(-1, 1, (40, 2)))
    m1, v1 = g1.predict(xq)
    m2, v2 = g2.predict(xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-8)
    assert g1.log_marginal_likelihood() == pytest.approx(
        g2.log_marginal_likelihood(), abs=1e-7)
    with pytest.raises(ValueError, match="pad_to"):
        GpRegressor().fit(x, y, pad_to=10)


@pytest.mark.slow
def test_pi_acquisition_runs():
    res = bayes_opt_minimize(_quad, [[-1, 1], [-1, 1]], n_init=6,
                             n_iters=8, key=4, acquisition="pi")
    assert res.y_best < -0.8


@pytest.mark.slow
def test_gp_posterior_draws():
    """predict_cov diag == predict var; draws reproduce mean/cov; at the
    training inputs (tiny noise) draws pass ~through the data."""
    from corrla_rs_tpu.ops.gp import GpRegressor

    rng = np.random.default_rng(21)
    x = jnp.asarray(np.linspace(0, 6, 25)[:, None])
    y = jnp.sin(x[:, 0])
    gp = GpRegressor(noise_var=1e-8).fit(x, y, optimize_hypers=False)
    xq = jnp.asarray(np.linspace(0, 6, 40)[:, None])
    mean, var = gp.predict(xq)
    cov = gp.predict_cov(xq)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(cov)),
                               np.asarray(var), atol=1e-8)
    draws = gp.sample_posterior(xq, 4000, key=5)
    np.testing.assert_allclose(np.asarray(draws.mean(0)),
                               np.asarray(mean), atol=0.05)
    emp_sd = np.asarray(draws.std(0))
    np.testing.assert_allclose(emp_sd, np.sqrt(np.asarray(var)) ,
                               atol=0.03)
    # coherence: neighboring queries are strongly correlated in draws
    c = np.corrcoef(np.asarray(draws[:, 20]), np.asarray(draws[:, 21]))
    assert c[0, 1] > 0.5 or emp_sd[20] < 1e-3


@pytest.mark.slow
def test_variance_acquisition_active_learning():
    """acquisition='variance' = sequential surrogate design: after a few
    adaptive points the GP's max posterior sd over the box drops well
    below the initial design's, and faster than random additions."""
    import jax

    from corrla_rs_tpu.ops.gp import GpRegressor

    def f(x):
        return float(np.sin(3 * x[0]) + 0.5 * np.cos(5 * x[1]))

    rng = np.random.default_rng(31)
    x0 = rng.uniform(0, 1, (6, 2))
    y0 = [f(p) for p in x0]

    def max_sd(xs, ys):
        gp = GpRegressor(noise_var=1e-6).fit(
            jnp.asarray(xs), jnp.asarray(ys))
        grid = jnp.asarray(rng.uniform(0, 1, (400, 2)))
        _m, v = gp.predict(grid)
        return float(jnp.sqrt(jnp.max(v)))

    bo = BayesOpt([[0, 1], [0, 1]], acquisition="variance", key=32)
    bo.tell(x0, y0)
    for _ in range(6):
        xn = np.asarray(bo.ask())[None]
        bo.tell(xn, [f(xn[0])])
    sd_active = max_sd(bo.x_observed, bo.y_observed)

    x_rand = np.concatenate([x0, rng.uniform(0, 1, (6, 2))])
    y_rand = [f(p) for p in x_rand]
    sd_rand = max_sd(x_rand, y_rand)
    assert sd_active < sd_rand
    assert sd_active < 0.7 * max_sd(x0, y0)
