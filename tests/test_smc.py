"""Tempered SMC: analytic-evidence and multimodal oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.smc import smc_sample


def test_gaussian_conjugate_evidence_and_posterior():
    """Gaussian prior x ~ N(0, s0^2 I), Gaussian observation y=0 of x with
    noise s^2: evidence and posterior are closed-form."""
    d = 3
    s0, s = 2.0, 0.5

    def ln_prior(x):
        return (-0.5 * jnp.sum(x ** 2) / s0 ** 2
                - 0.5 * d * jnp.log(2 * jnp.pi * s0 ** 2))

    def ln_like(x):
        return (-0.5 * jnp.sum(x ** 2) / s ** 2
                - 0.5 * d * jnp.log(2 * jnp.pi * s ** 2))

    n = 4096
    init = s0 * jax.random.normal(jax.random.key(0), (n, d), jnp.float64)
    res = smc_sample(ln_like, ln_prior, init, n_mcmc=5, key=1)

    logz_true = -0.5 * d * np.log(2 * np.pi * (s0 ** 2 + s ** 2))
    # measured MC spread at n=4096 is ~±0.07 over seeds (no bias)
    assert res.log_evidence == pytest.approx(logz_true, abs=0.15)

    post_var = 1.0 / (1.0 / s0 ** 2 + 1.0 / s ** 2)
    p = np.asarray(res.particles)
    np.testing.assert_allclose(p.mean(0), 0.0, atol=0.05)
    np.testing.assert_allclose(p.var(0), post_var, rtol=0.15)

    # temperature ladder: strictly increasing, 0 -> exactly 1
    b = np.asarray(res.betas)
    assert b[0] == 0.0 and b[-1] == pytest.approx(1.0, abs=1e-12)
    assert np.all(np.diff(b) > 0)
    assert res.n_stages == len(b) - 1
    assert np.all(np.asarray(res.accept_ratios) > 0.1)


def test_bimodal_mass_recovery():
    """Well-separated symmetric bimodal likelihood: the annealed population
    keeps BOTH modes at ~equal mass (single-temperature MCMC routinely
    collapses into one)."""
    m, sig = 4.0, 0.3

    def ln_prior(x):
        return -0.5 * jnp.sum(x ** 2) / 10.0 ** 2

    def ln_like(x):
        a = -0.5 * jnp.sum((x - m) ** 2) / sig ** 2
        b = -0.5 * jnp.sum((x + m) ** 2) / sig ** 2
        return jnp.logaddexp(a, b)

    n = 4096
    init = 10.0 * jax.random.normal(jax.random.key(2), (n, 1), jnp.float64)
    res = smc_sample(ln_like, ln_prior, init, n_mcmc=8, key=3)
    p = np.asarray(res.particles)[:, 0]
    frac_right = float(np.mean(p > 0))
    assert 0.35 < frac_right < 0.65
    # modes located correctly
    assert np.abs(p[p > 0].mean() - m) < 0.15
    assert np.abs(p[p < 0].mean() + m) < 0.15


def test_evidence_model_comparison():
    """log-Bayes factor between two nested models matches the analytic
    value: data favor the tighter likelihood when it is true."""
    d = 1
    s0 = 1.0

    def ln_prior(x):
        return (-0.5 * jnp.sum(x ** 2) / s0 ** 2
                - 0.5 * d * jnp.log(2 * jnp.pi * s0 ** 2))

    def make_like(s):
        def ln_like(x):
            return (-0.5 * jnp.sum(x ** 2) / s ** 2
                    - 0.5 * d * jnp.log(2 * jnp.pi * s ** 2))
        return ln_like

    n = 4096
    init = jax.random.normal(jax.random.key(4), (n, d), jnp.float64)
    z1 = smc_sample(make_like(0.3), ln_prior, init, key=5).log_evidence
    z2 = smc_sample(make_like(3.0), ln_prior, init, key=6).log_evidence

    def logz_true(s):
        return -0.5 * d * np.log(2 * np.pi * (s0 ** 2 + s ** 2))

    bf_true = logz_true(0.3) - logz_true(3.0)
    assert (z1 - z2) == pytest.approx(bf_true, abs=0.1)


def test_max_stages_guard():
    def ln_prior(x):
        return -0.5 * jnp.sum(x ** 2)

    def ln_like(x):
        return -0.5 * jnp.sum((x - 50.0) ** 2) / 1e-6  # brutal anneal

    init = jax.random.normal(jax.random.key(7), (128, 2), jnp.float64)
    with pytest.raises(RuntimeError, match="beta=1"):
        smc_sample(ln_like, ln_prior, init, max_stages=2, key=8)
