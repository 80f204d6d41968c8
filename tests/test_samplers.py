"""Sampler parity tests (reference space_samplers.rs:421-570)."""
import jax.numpy as jnp
import numpy as np
import pytest

import corrla_rs_tpu as crt
from corrla_rs_tpu.ops.samplers import (
    DeMcSampler,
    constr_dirichlet_sample,
    ln_like_dirichlet,
    ln_like_sum,
    ln_prior_uniform,
)

# U234/U235/U238 enrichment bounds fixture (space_samplers.rs:430-434).
BOUNDS = np.array([[0.0, 0.0026], [0.1955, 0.1995], [0.80, 0.825]])


@pytest.mark.parametrize("n_samples", [8, 13, 21])
def test_constr_dirichlet(n_samples):
    samples = constr_dirichlet_sample(
        BOUNDS, n_samples, max_zshots=500, chunk_size=20000, c_scale=1.0,
        key=0,
    )
    assert samples.shape == (n_samples, 3)
    s = np.asarray(samples)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-6)
    assert (s >= BOUNDS[:, 0][None, :]).all()
    assert (s <= BOUNDS[:, 1][None, :]).all()


def test_constr_dirichlet_alphas_broadcast():
    s1 = constr_dirichlet_sample(
        BOUNDS, 5, 500, 20000, 1.0, alphas=[1.0], key=1
    )
    s2 = constr_dirichlet_sample(
        BOUNDS, 5, 500, 20000, 1.0, alphas=[1.0, 1.0, 1.0], key=1
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2))
    with pytest.raises(ValueError):
        constr_dirichlet_sample(BOUNDS, 5, 500, 20000, 1.0, alphas=[1.0, 2.0])


def test_constr_dirichlet_infeasible_raises():
    impossible = np.array([[0.9, 1.0], [0.9, 1.0], [0.9, 1.0]])
    with pytest.raises(RuntimeError):
        constr_dirichlet_sample(impossible, 4, 3, 100, 1.0, key=0)


def test_demc_gaussian():
    # Parity with test_demcmc_sampler_gauss (space_samplers.rs:462-506):
    # recover mu=2, std=3 at 5e-1, acceptance ratio > 0.2.
    mu, std = 2.0, 3.0

    def lnp_like(x):
        return -0.5 * ((x[0] - mu) / std) ** 2 - jnp.log(std)

    lnp = ln_like_sum(lnp_like, ln_prior_uniform(np.array([[-20.0, 20.0]])))
    chains0 = jnp.zeros((8, 1))
    sampler = DeMcSampler(lnp, chains0, gamma=0.8, var_epsilon=1e-10, key=0)
    sampler.sample_mcmc(5000)

    samples = np.asarray(sampler.get_samples(2000))
    assert samples.shape == (2000 * 8, 1)
    assert abs(samples.mean() - mu) < 5e-1
    assert abs(samples.std(ddof=1) - std) < 5e-1
    assert sampler.accept_ratio() > 0.2


def test_demc_dirichlet_simplex():
    # Parity with test_demcmc_dirichlet (space_samplers.rs:509-569): every
    # sample stays on the simplex and inside bounds.
    seeds = constr_dirichlet_sample(BOUNDS, 8, 500, 20000, 1.0, key=2)
    lnp = ln_like_sum(
        ln_like_dirichlet(jnp.ones(3)), ln_prior_uniform(BOUNDS)
    )

    def fixup(x):
        return x / jnp.sum(x)

    sampler = DeMcSampler(
        lnp, seeds, gamma=0.8, var_epsilon=1e-10, prop_fixup_fn=fixup, key=3
    )
    sampler.sample_mcmc(2000)
    tail = np.asarray(sampler.get_samples(250))
    np.testing.assert_allclose(tail.sum(axis=1), 1.0, atol=1e-6)
    assert (tail > BOUNDS[:, 0][None, :] - 1e-12).all()
    assert (tail < BOUNDS[:, 1][None, :] + 1e-12).all()


def test_get_samples_interleaving():
    # Observable ordering parity (space_samplers.rs:309-323): generation-
    # major, chain-minor round robin.
    def lnp(x):
        return -0.5 * jnp.sum(x**2)

    chains0 = jnp.arange(3.0)[:, None]  # 3 chains, marked by value
    sampler = DeMcSampler(lnp, chains0, gamma=0.0, var_epsilon=0.0, key=0)
    # gamma=0, eps=0 -> proposal == current -> always accepted, chains static
    sampler.sample_mcmc(4)
    out = np.asarray(sampler.get_samples(2))
    np.testing.assert_allclose(out[:, 0], [0.0, 1.0, 2.0, 0.0, 1.0, 2.0])


def test_demc_serial_mode_gaussian():
    # Reference serial sample_mcmc semantics (space_samplers.rs:361-374):
    # within a generation, chain c proposes from already-updated chains <c.
    # Statistical equivalence with the parallel mode on a 1-D Gaussian.
    from corrla_rs_tpu.ops.samplers import DeMcSampler

    mu, std = 2.0, 3.0

    def lnp_like(x):
        return -0.5 * ((x[0] - mu) / std) ** 2 - jnp.log(std)

    lnp = ln_like_sum(lnp_like, ln_prior_uniform(np.array([[-20.0, 20.0]])))
    heads0 = jnp.zeros((8, 1))
    s = DeMcSampler(lnp, heads0, gamma=0.8, var_epsilon=1e-10, key=0)
    s.sample_mcmc(3000, mode="serial")
    tail = np.asarray(s.get_samples(1200))
    assert abs(tail.mean() - mu) < 5e-1
    assert abs(tail.std(ddof=1) - std) < 5e-1
    assert s.accept_ratio() > 0.2
    # and the two modes genuinely differ in trajectory for the same key
    s2 = DeMcSampler(lnp, heads0, gamma=0.8, var_epsilon=1e-10, key=0)
    s2.sample_mcmc(50, mode="parallel")
    s3 = DeMcSampler(lnp, heads0, gamma=0.8, var_epsilon=1e-10, key=0)
    s3.sample_mcmc(50, mode="serial")
    assert not np.allclose(
        np.asarray(s2.chain_history), np.asarray(s3.chain_history)
    )


def test_cs_mcmc_dirichlet_sample_surface():
    # Full-pipeline parity with lib_math_utils_py.rs:107-168.
    samples, ar = crt.cs_mcmc_dirichlet_sample(
        BOUNDS, n_samples=500, n_seed_samples=8, max_zshots=500,
        chunk_size=20000, c_scale=1.0, alphas=np.ones(3), gamma=0.8,
        var_epsilon=1e-12, seed=4,
    )
    assert samples.shape == (500 * 8, 3)
    s = np.asarray(samples)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-6)
    assert 0.0 < ar <= 1.0


def test_cs_dirichlet_sample_surface():
    samples = crt.cs_dirichlet_sample(BOUNDS, 6, 500, 20000, 1.0, np.ones(3))
    assert samples.shape == (6, 3)


@pytest.mark.slow
def test_pick_others_batched_distinct_and_uniform():
    import jax

    from corrla_rs_tpu.ops.samplers import pick_others_batched

    n, k = 16, 6
    counts = np.zeros((n, n))
    for seed in range(200):
        idx = np.asarray(pick_others_batched(jax.random.key(seed), n, k))
        for c in range(n):
            row = idx[c]
            assert len(set(row.tolist())) == k, "indices must be distinct"
            assert c not in row, "self index must be excluded"
            counts[c, row] += 1
    # each other-index should appear with frequency ~ k/(n-1)
    expected = 200 * k / (n - 1)
    off_diag = counts[~np.eye(n, dtype=bool)]
    assert abs(off_diag.mean() - expected) < 1e-9  # exact by counting
    assert off_diag.std() < 0.15 * expected
