"""MLMC: unbiasedness, allocation shape, cost-vs-MC oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.mlmc import mlmc_estimate

# synthetic refinement hierarchy over X ~ N(0,1):
#   P_l(x) = x^2 + (0.5)^l * sin(7 x)   ->   E[P_inf-ish] with
#   corrections Y_l = (0.5^l - 0.5^(l-1)) sin(7x): V_l decays 4x/level
LEVELS = 4
COSTS = np.array([1.0, 2.0, 4.0, 8.0])


def _level_fn(lvl):
    def f(x):
        return x[:, 0] ** 2 + 0.5 ** lvl * jnp.sin(7.0 * x[:, 0])
    return f


def sample_inputs(key, n):
    return jax.random.normal(key, (n, 1), jnp.float64)


def _truth():
    # E[x^2] = 1; E[sin(7x)] = 0 for x ~ N(0,1) (odd) -> E[P_L] = 1
    return 1.0


@pytest.mark.slow
def test_unbiased_and_se_calibrated():
    ests, ses = [], []
    for s in range(40):
        r = mlmc_estimate([_level_fn(l) for l in range(LEVELS)],
                          sample_inputs, COSTS, target_se=0.01,
                          key=100 + s)
        ests.append(r.mean)
        ses.append(r.std_error)
    ests = np.asarray(ests)
    err = ests.mean() - _truth()
    assert abs(err) < 4 * ests.std(ddof=1) / np.sqrt(len(ests)) + 1e-9
    # reported SE consistent with the replicate scatter (within 2x)
    assert np.mean(ses) == pytest.approx(ests.std(ddof=1), rel=1.0)
    assert ests.std(ddof=1) < 0.02


@pytest.mark.slow
def test_allocation_decays_with_level():
    r = mlmc_estimate([_level_fn(l) for l in range(LEVELS)],
                      sample_inputs, COSTS, target_se=0.005, key=0)
    n = r.n_per_level
    # variance decays and cost grows -> strictly fewer samples per level
    assert n[0] > n[1] > n[2]
    # correction variances actually decay
    assert r.level_vars[1] > r.level_vars[2] > r.level_vars[3]
    # and the finest level got only a small share of the total cost
    assert n[-1] * (COSTS[-1] + COSTS[-2]) < 0.5 * r.total_cost


def test_cheaper_than_single_level_mc():
    """Equal-accuracy cost comparison: MLMC total cost is well below
    fine-level-only MC at the same target SE."""
    target = 0.01
    # bucket_sizes=False: measure the exact optimal-allocation cost
    r = mlmc_estimate([_level_fn(l) for l in range(LEVELS)],
                      sample_inputs, COSTS, target_se=target, key=1,
                      bucket_sizes=False)
    # fine-only MC: n = Var(P_L)/se^2 at cost_L each
    rng = np.random.default_rng(2)
    x = rng.standard_normal(100000)
    var_fine = np.var(x ** 2 + 0.5 ** 3 * np.sin(7 * x))
    mc_cost = var_fine / target ** 2 * COSTS[-1]
    assert r.total_cost < 0.5 * mc_cost


def test_validation():
    with pytest.raises(ValueError, match="costs"):
        mlmc_estimate([_level_fn(0)], sample_inputs, [1.0, 2.0])
    with pytest.raises(ValueError, match="level"):
        mlmc_estimate([], sample_inputs, [])
