"""MFMC: allocation closed forms, unbiasedness, measured variance
reduction vs the analytic design prediction."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.multifidelity import (
    control_variate_estimate,
    mfmc_design,
    mfmc_estimate,
)

# models over X ~ N(0,1): analytic stats
#   f1 = x^2            E=1, var=2
#   f2 = x^2 + 0.5 x    cov(f1,f2)=2, var=2.25, rho=0.9428
#   f3 = 0.8 x^2 + x    cov(f1,f3)=1.6, var=2.28, rho=0.7499
F1 = lambda x: x[:, 0] ** 2
F2 = lambda x: x[:, 0] ** 2 + 0.5 * x[:, 0]
F3 = lambda x: 0.8 * x[:, 0] ** 2 + x[:, 0]
SIG = np.sqrt([2.0, 2.25, 2.28])
RHO = np.array([1.0, 2.0 / np.sqrt(2 * 2.25), 1.6 / np.sqrt(2 * 2.28)])
COSTS = np.array([1.0, 0.05, 0.001])


def sample_inputs(key, n):
    return jax.random.normal(key, (n, 1), jnp.float64)


def test_design_closed_form():
    d = mfmc_design(SIG, RHO, COSTS, budget=1000.0)
    # r_1 == 1 by construction => m increasing/nested
    assert np.all(np.diff(d.m) >= 0)
    r2 = RHO ** 2
    r2n = np.append(r2[1:], 0.0)
    r = np.sqrt(COSTS[0] * (r2 - r2n) / (COSTS * (1.0 - r2[1])))
    assert r[0] == pytest.approx(1.0)
    m1 = 1000.0 / np.dot(COSTS, r)
    assert d.m[0] == int(np.floor(m1))
    np.testing.assert_allclose(d.alpha, RHO * SIG[0] / SIG, rtol=1e-12)
    assert d.speedup > 1.5
    assert d.variance < d.mc_variance


@pytest.mark.slow
def test_unbiased_and_variance_reduction():
    """Replicate the estimator over seeds: mean ~ E[f1] = 1 and the
    empirical replicate variance tracks the design prediction."""
    d = mfmc_design(SIG, RHO, COSTS, budget=400.0)
    ests = []
    for s in range(300):
        r = mfmc_estimate([F1, F2, F3], sample_inputs, COSTS,
                          budget=400.0, design=d, key=1000 + s)
        ests.append(r.mean)
    ests = np.asarray(ests)
    se = ests.std(ddof=1) / np.sqrt(len(ests))
    assert ests.mean() == pytest.approx(1.0, abs=4 * se + 1e-9)
    emp_var = ests.var(ddof=1)
    # empirical variance within 35% of the closed-form prediction
    assert emp_var == pytest.approx(d.variance, rel=0.35)
    # and genuinely below single-fidelity MC at the same budget
    assert emp_var < 0.7 * d.mc_variance


@pytest.mark.slow
def test_pilot_path_runs_and_orders():
    res = mfmc_estimate([F1, F2, F3], sample_inputs, COSTS,
                        budget=300.0, n_pilot=4000, key=7)
    assert res.mean == pytest.approx(1.0, abs=0.25)
    np.testing.assert_allclose(
        res.design.rhos, RHO, atol=0.03)
    assert res.n_evals[0] < res.n_evals[1] < res.n_evals[2]


def test_ordering_validation():
    with pytest.raises(ValueError, match="decreasing"):
        mfmc_design(SIG, np.array([1.0, 0.7, 0.9]), COSTS, 100.0)
    with pytest.raises(ValueError, match="rhos\\[0\\]"):
        mfmc_design(SIG, np.array([0.9, 0.7, 0.5]), COSTS, 100.0)
    # cost condition: model 3 cheaper-per-variance than model 2
    # (c_1/c_2 = 0.5 <= (rho_2^2-rho_3^2)/rho_3^2 = 0.58 -> infeasible)
    with pytest.raises(ValueError, match="cost/correlation"):
        mfmc_design(SIG, RHO, np.array([1.0, 0.01, 0.02]), 100.0)


def test_single_model_degenerates_to_mc():
    d = mfmc_design([np.sqrt(2.0)], [1.0], [1.0], budget=64.0)
    assert d.m[0] == 64
    assert d.speedup == pytest.approx(1.0)


def test_control_variates():
    key = jax.random.key(3)
    x = jax.random.normal(key, (20000,), jnp.float64)
    y_hi = x ** 2
    y_lo = x ** 2 + 0.1 * jax.random.normal(jax.random.key(4), (20000,),
                                            jnp.float64)
    est, vr = control_variate_estimate(y_hi, y_lo, mu_lo=1.0)
    assert est == pytest.approx(1.0, abs=0.01)
    assert vr > 50.0  # rho ~ 0.999
    # uncorrelated control: no reduction, estimate still sane
    est2, vr2 = control_variate_estimate(y_hi, x, mu_lo=0.0)
    assert est2 == pytest.approx(1.0, abs=0.05)
    assert vr2 < 1.2
    with pytest.raises(ValueError, match="paired"):
        control_variate_estimate(y_hi, y_lo[:10], 0.0)
