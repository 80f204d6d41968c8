"""NUTS: statistical oracles, tree-depth behavior, HMC cross-check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.nuts import nuts_run


def test_gaussian_recovery():
    d = 10
    sig = jnp.asarray(np.geomspace(0.2, 2.0, d))

    def lnp(x):
        return -0.5 * jnp.sum((x / sig) ** 2)

    x0 = jax.random.normal(jax.random.key(0), (16, d), jnp.float64)
    res = nuts_run(x0, lnp, n_steps=200, n_warmup=200, key=1)
    draws = np.asarray(res.history[50:]).reshape(-1, d)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(draws.std(0), np.asarray(sig), rtol=0.15)
    assert res.n_divergent == 0
    assert 0.6 < res.accept_ratio <= 1.0
    assert 1.0 <= res.mean_tree_depth <= 8.0


@pytest.mark.slow
def test_correlated_target_and_no_tuning():
    """rho=0.97 correlated Gaussian with NO tuning inputs at all — the
    point of NUTS."""
    rho = 0.97
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lnp(x):
        return -0.5 * x @ prec @ x

    x0 = jax.random.normal(jax.random.key(2), (32, 2), jnp.float64)
    res = nuts_run(x0, lnp, n_steps=500, n_warmup=500, key=3)
    draws = np.asarray(res.history[100:]).reshape(-1, 2)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.12)


@pytest.mark.slow
def test_tree_depth_scales_with_anisotropy():
    """At a FIXED step size (warmup off — dual averaging would simply
    rescale eps to the target), a wider target needs longer trajectories
    and NUTS's tree depth grows to provide them — the adaptive behavior
    fixed-length HMC lacks."""
    def lnp_narrow(x):
        return -0.5 * jnp.sum(x ** 2)

    def lnp_wide(x):
        return -0.5 * jnp.sum((x / 20.0) ** 2)

    x0 = jax.random.normal(jax.random.key(4), (8, 2), jnp.float64)
    kw = dict(n_steps=100, n_warmup=0, key=5, adapt_mass=False,
              init_step_size=0.4)
    r_n = nuts_run(x0, lnp_narrow, **kw)
    r_w = nuts_run(20.0 * x0, lnp_wide, **kw)
    assert r_w.mean_tree_depth > r_n.mean_tree_depth + 2.0


def test_funnel_divergences_detected():
    """Neal's funnel: the canonical divergence generator — NUTS must
    flag divergent trajectories rather than silently biasing."""
    def lnp(x):
        v, theta = x[0], x[1:]
        return (-0.5 * (v / 3.0) ** 2
                - 0.5 * jnp.sum(theta ** 2) * jnp.exp(-v)
                - 0.5 * (x.shape[0] - 1) * v)

    x0 = jax.random.normal(jax.random.key(6), (16, 3), jnp.float64)
    res = nuts_run(x0, lnp, n_steps=200, n_warmup=200, key=7,
                   target_accept=0.8)
    assert bool(jnp.all(jnp.isfinite(res.history)))
    # the funnel neck generates divergences at standard target_accept
    assert res.n_divergent > 0


@pytest.mark.slow
def test_matches_hmc_on_easy_target():
    from corrla_rs_tpu.ops.hmc import hmc_run

    def lnp(x):
        return -0.5 * jnp.sum((x - 1.0) ** 2)

    x0 = jax.random.normal(jax.random.key(8), (32, 3), jnp.float64)
    r_nuts = nuts_run(x0, lnp, n_steps=800, n_warmup=300, key=9)
    r_hmc = hmc_run(x0, lnp, n_steps=800, n_warmup=300, key=9)
    t_n = np.asarray(r_nuts.history[100:]).reshape(-1, 3)
    t_h = np.asarray(r_hmc.history[100:]).reshape(-1, 3)
    # both must match the TRUTH (mean 1, std 1) within MCMC error
    for t in (t_n, t_h):
        np.testing.assert_allclose(t.mean(0), 1.0, atol=0.2)
        np.testing.assert_allclose(t.std(0), 1.0, rtol=0.12)


def test_validation():
    with pytest.raises(ValueError, match="n_chains"):
        nuts_run(jnp.zeros(3), lambda x: 0.0, 5)
