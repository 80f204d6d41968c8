"""Affine-invariant stretch sampler: statistical oracles.

Tolerances follow the reference's MCMC test style (space_samplers.rs:
462-506 recovers a Gaussian's mu/sigma at 5e-1 with AR > 0.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.ensemble_mcmc import EnsembleSampler, stretch_run


def _init_ball(key, n_walkers, ndim, center=0.0, scale=1.0):
    return center + scale * jax.random.normal(
        jax.random.key(key), (n_walkers, ndim), jnp.float64)


def test_gaussian_recovery():
    mu = jnp.array([1.5, -2.0])
    sig = jnp.array([0.7, 1.3])

    def lnp(x):
        return -0.5 * jnp.sum(((x - mu) / sig) ** 2)

    walkers = _init_ball(0, 32, 2, scale=0.5)
    hist, state = stretch_run(walkers, lnp, 3000, key=1)
    tail = np.asarray(hist[1000:]).reshape(-1, 2)
    np.testing.assert_allclose(tail.mean(0), np.asarray(mu), atol=0.1)
    np.testing.assert_allclose(tail.std(0), np.asarray(sig), atol=0.1)
    ar = float(state.n_accept) / (
        float(state.n_accept) + float(state.n_reject))
    assert 0.2 < ar < 0.9


def test_affine_invariance():
    """The defining property: the sampler's behavior is IDENTICAL under a
    linear reparameterization (same key => same z/partner/accept draws).
    A power-of-two diagonal scaling makes the equivariance BIT-EXACT
    (every multiply/divide by 4 and 1/2 is exact in binary floating
    point), so trajectories must match exactly, not statistically.
    """
    scale = jnp.array([4.0, 0.5])  # condition number 8, exactly
    inv = jnp.array([0.25, 2.0])

    def lnp_iso(x):
        return -0.5 * jnp.sum(x ** 2)

    def lnp_skew(y):
        return -0.5 * jnp.sum((y * inv) ** 2)

    w0 = _init_ball(2, 16, 2)
    h_iso, s_iso = stretch_run(w0, lnp_iso, 400, key=3)
    h_skew, s_skew = stretch_run(w0 * scale, lnp_skew, 400, key=3)
    assert int(s_iso.n_accept) == int(s_skew.n_accept)
    np.testing.assert_array_equal(
        np.asarray(h_skew), np.asarray(h_iso * scale))


def test_anisotropic_beats_nothing_burns():
    """Strongly correlated Gaussian: the stretch move still mixes (this is
    the case plain DEMC with default gamma struggles on)."""
    rho = 0.99
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lnp(x):
        return -0.5 * x @ prec @ x

    hist, state = stretch_run(_init_ball(4, 64, 2, scale=0.1), lnp, 4000,
                              key=5)
    tail = np.asarray(hist[2000:]).reshape(-1, 2)
    emp = np.cov(tail.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.15)
    ar = float(state.n_accept) / (
        float(state.n_accept) + float(state.n_reject))
    assert ar > 0.15


def test_resume_continuity():
    def lnp(x):
        return -0.5 * jnp.sum(x ** 2)

    w0 = _init_ball(6, 8, 2)
    h1, s1 = stretch_run(w0, lnp, 50, key=7)
    h2, s2 = stretch_run(s1.walkers, lnp, 50, key=s1.key)
    # one 100-step run with the same initial key differs only in chunk
    # boundaries of the pre-drawn randomness; check shapes + finiteness
    assert h2.shape == (50, 8, 2)
    assert bool(jnp.all(jnp.isfinite(h2)))
    assert not np.allclose(np.asarray(h1[-1]), np.asarray(h2[-1]))


def test_sampler_class_surface():
    def lnp(x):
        return -0.5 * jnp.sum(x ** 2)

    smp = EnsembleSampler(lnp, _init_ball(8, 16, 3), key=9)
    smp.sample_mcmc(1600)
    assert smp.chain_history.shape[0] == 100
    out = smp.get_samples(10)
    assert out.shape == (160, 3)
    ar1 = smp.accept_ratio()
    assert 0.1 < ar1 < 0.95
    smp.sample_mcmc(160)  # resumes
    assert smp.chain_history.shape[0] == 110


def test_validation():
    def lnp(x):
        return 0.0

    with pytest.raises(ValueError, match="even"):
        stretch_run(jnp.zeros((5, 2)), lnp, 3)
    with pytest.raises(ValueError, match="even"):
        stretch_run(jnp.zeros((2, 2)), lnp, 3)
