"""HMC: statistical oracles + adaptation behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.hmc import hmc_run


def test_gaussian_recovery_high_dim():
    """d=50 anisotropic Gaussian: the case where gradient-free samplers
    mix diffusively; HMC recovers every marginal in a few hundred
    generations."""
    d = 50
    sig = jnp.asarray(np.geomspace(0.1, 3.0, d))

    def lnp(x):
        return -0.5 * jnp.sum((x / sig) ** 2)

    x0 = jax.random.normal(jax.random.key(0), (16, d), jnp.float64)
    res = hmc_run(x0, lnp, n_steps=400, n_warmup=400, key=1)
    draws = np.asarray(res.history).reshape(-1, d)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.25)
    np.testing.assert_allclose(draws.std(0), np.asarray(sig),
                               rtol=0.2, atol=0.03)
    assert res.n_divergent == 0
    assert 0.6 < res.accept_ratio <= 1.0


def test_dual_averaging_hits_target():
    def lnp(x):
        return -0.5 * jnp.sum(x ** 2)

    x0 = jax.random.normal(jax.random.key(2), (8, 10), jnp.float64)
    res = hmc_run(x0, lnp, n_steps=300, n_warmup=500,
                  target_accept=0.8, key=3, adapt_mass=False)
    # adapted step size should realize the target acceptance closely
    assert res.accept_ratio == pytest.approx(0.8, abs=0.12)


@pytest.mark.slow
def test_mass_adaptation_helps_anisotropy():
    """sigma spread 1e2: with diagonal-mass adaptation the effective
    step per dimension equalizes and sampling stays efficient."""
    sig = jnp.asarray([0.05, 5.0])

    def lnp(x):
        return -0.5 * jnp.sum((x / sig) ** 2)

    x0 = 0.1 * jax.random.normal(jax.random.key(4), (16, 2), jnp.float64)
    res = hmc_run(x0, lnp, n_steps=600, n_warmup=600, key=5)
    draws = np.asarray(res.history[100:]).reshape(-1, 2)
    np.testing.assert_allclose(draws.std(0), np.asarray(sig), rtol=0.25)
    # adapted inverse mass tracks the marginal variances (ratio ~ 1e4)
    ratio = float(res.inv_mass[1] / res.inv_mass[0])
    assert ratio > 1e2


def test_correlated_target():
    rho = 0.95
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lnp(x):
        return -0.5 * x @ prec @ x

    x0 = jax.random.normal(jax.random.key(6), (32, 2), jnp.float64)
    res = hmc_run(x0, lnp, n_steps=500, n_warmup=400, key=7)
    draws = np.asarray(res.history[100:]).reshape(-1, 2)
    emp = np.cov(draws.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.12)


def test_divergence_counting_and_validation():
    # an absurdly large step size on a narrow target must diverge-reject,
    # not NaN the chain
    def lnp(x):
        return -0.5 * jnp.sum((x / 1e-3) ** 2)

    x0 = jnp.ones((4, 2), jnp.float64)
    res = hmc_run(x0, lnp, n_steps=20, n_warmup=0, init_step_size=10.0,
                  key=8, adapt_mass=False)
    assert bool(jnp.all(jnp.isfinite(res.history)))
    with pytest.raises(ValueError, match="n_chains"):
        hmc_run(jnp.zeros(3), lnp, 5)


@pytest.mark.slow
def test_jittered_trajectories_fix_resonance():
    """A fixed trajectory length can resonate (end where it started) on a
    harmonic target with matching period; jitter_steps breaks it. With
    eps*L ~ 2*pi the fixed-length sampler's moves are tiny; the jittered
    one explores."""
    def lnp(x):
        return -0.5 * jnp.sum(x ** 2)

    x0 = 3.0 + jax.random.normal(jax.random.key(9), (8, 2), jnp.float64)
    # eps = 2*pi/32 exactly: a full period per trajectory
    kw = dict(n_steps=200, n_warmup=0, n_leapfrog=32,
              init_step_size=float(2 * np.pi / 32), adapt_mass=False)
    fixed = hmc_run(x0, lnp, key=10, **kw)
    jit = hmc_run(x0, lnp, key=10, jitter_steps=True, **kw)
    # resonance: fixed-length moves barely change x -> mean stays ~3
    m_fixed = float(np.abs(np.asarray(fixed.history[-50:]).mean()))
    m_jit = float(np.abs(np.asarray(jit.history[-50:]).mean()))
    assert m_fixed > 1.0       # stuck near the start
    assert m_jit < 0.5         # mixed to the target mean 0
