"""Laplace approximation: analytic Gaussian oracles + SMC cross-check."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.laplace import laplace_approx, laplace_sample


def test_gaussian_exact():
    """On a Gaussian the Laplace approximation is EXACT: mode, covariance
    and evidence all match closed form."""
    mu = jnp.array([1.0, -2.0, 0.5])
    cov = jnp.array([[1.0, 0.3, 0.0],
                     [0.3, 0.5, 0.1],
                     [0.0, 0.1, 2.0]])
    prec = jnp.linalg.inv(cov)
    scale = 3.7  # unnormalized

    def lnp(x):
        return -0.5 * (x - mu) @ prec @ (x - mu) + jnp.log(scale)

    res = laplace_approx(lnp, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(res.x_map), np.asarray(mu),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.cov), np.asarray(cov),
                               atol=1e-5)
    # Z = scale * (2 pi)^{d/2} sqrt(det cov)
    logz_true = (np.log(scale) + 1.5 * np.log(2 * np.pi)
                 + 0.5 * np.linalg.slogdet(np.asarray(cov))[1])
    assert res.log_evidence == pytest.approx(logz_true, abs=1e-6)
    assert res.converged


@pytest.mark.slow
def test_evidence_matches_smc_on_nongaussian():
    """Mildly non-Gaussian posterior: Laplace evidence within ~0.1 nat of
    the SMC estimate (both approximate the same integral)."""
    def ln_prior(x):
        return -0.5 * jnp.sum(x ** 2) - jnp.log(2 * jnp.pi)

    def ln_like(x):
        # smooth, unimodal, skewless but non-quadratic (coefficient kept
        # mild: the Laplace error on a 0.25-strength quartic is a real
        # ~0.17 nats — measured — which is the approximation, not a bug)
        return -0.05 * jnp.sum((x - 0.5) ** 4) - 0.5 * jnp.sum(
            (x - 0.5) ** 2)

    def ln_post(x):
        return ln_prior(x) + ln_like(x)

    lap = laplace_approx(ln_post, jnp.zeros(2))

    from corrla_rs_tpu.ops.smc import smc_sample
    init = jax.random.normal(jax.random.key(0), (4096, 2), jnp.float64)
    smc = smc_sample(ln_like, ln_prior, init, n_mcmc=5, key=1)
    assert lap.log_evidence == pytest.approx(smc.log_evidence, abs=0.15)


@pytest.mark.slow
def test_multistart_finds_dominant_mode():
    """Two modes with very different heights: single start from the basin
    of the minor mode stays there; restarts recover the dominant one."""
    def lnp(x):
        a = -0.5 * jnp.sum((x - 4.0) ** 2) / 0.3 ** 2          # minor
        b = jnp.log(50.0) - 0.5 * jnp.sum((x + 4.0) ** 2) / 0.3 ** 2
        return jnp.logaddexp(a, b)

    x0 = jnp.array([4.2, 3.8])  # in the minor basin
    single = laplace_approx(lnp, x0)
    assert float(single.x_map[0]) > 0  # stuck at the minor mode
    multi = laplace_approx(lnp, x0, n_restarts=32, spread=5.0, key=2)
    np.testing.assert_allclose(np.asarray(multi.x_map), [-4.0, -4.0],
                               atol=0.01)


@pytest.mark.slow
def test_sampling_and_saddle_guard():
    mu = jnp.array([2.0, -1.0])

    def lnp(x):
        return -0.5 * jnp.sum((x - mu) ** 2 / jnp.array([0.25, 4.0]))

    res = laplace_approx(lnp, jnp.zeros(2))
    draws = laplace_sample(res, 20000, key=3)
    np.testing.assert_allclose(np.asarray(draws.mean(0)), np.asarray(mu),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(draws.std(0)), [0.5, 2.0],
                               rtol=0.05)

    # a maximum in one direction, minimum in another -> loud error
    def saddle(x):
        return -0.5 * x[0] ** 2 + 0.5 * x[1] ** 2

    with pytest.raises(ValueError, match="positive definite"):
        laplace_approx(saddle, jnp.array([0.1, 0.0]))
