"""MCMC diagnostics tests."""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.diagnostics import effective_sample_size, gelman_rubin


def test_rhat_converged_iid(rng):
    # iid N(0,1) chains: R-hat ~ 1
    h = jnp.asarray(rng.standard_normal((2000, 8, 3)))
    rhat = np.asarray(gelman_rubin(h))
    assert (np.abs(rhat - 1.0) < 0.02).all()


def test_rhat_detects_disagreement(rng):
    # chains stuck at different means: R-hat >> 1
    offsets = np.arange(8)[None, :, None] * 3.0
    h = jnp.asarray(rng.standard_normal((500, 8, 1)) * 0.1 + offsets)
    rhat = float(gelman_rubin(h)[0])
    assert rhat > 2.0


def test_ess_iid_close_to_n(rng):
    h = jnp.asarray(rng.standard_normal((1000, 4, 2)))
    ess = np.asarray(effective_sample_size(h))
    assert (ess > 2500).all()  # ~4000 nominal, iid should stay near it
    assert (ess <= 4000 * 1.5).all()


def test_ess_correlated_much_smaller(rng):
    # AR(1) with phi=0.95: ESS ~ n (1-phi)/(1+phi) ~ 2.6% of nominal
    n, m = 4000, 4
    x = np.zeros((n, m))
    eps = rng.standard_normal((n, m))
    for t in range(1, n):
        x[t] = 0.95 * x[t - 1] + eps[t]
    ess = float(effective_sample_size(jnp.asarray(x[:, :, None]))[0])
    nominal = n * m
    assert ess < 0.15 * nominal


def test_demc_history_plugs_in():
    from corrla_rs_tpu.ops.dream import DreamSampler

    def lnp(x):
        return -0.5 * jnp.sum(x**2)

    s = DreamSampler(lnp, jnp.linspace(-1, 1, 10)[:, None], n_adapt=200, key=0)
    s.sample_mcmc(1500)
    hist = s.chain_history[500:]
    rhat = float(gelman_rubin(hist)[0])
    assert rhat < 1.1
    ess = float(effective_sample_size(hist)[0])
    assert ess > 100.0
