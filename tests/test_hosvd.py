"""HOSVD / Tucker decomposition (ops/hosvd) — extension tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.hosvd import (
    hooi,
    hosvd,
    mode_multiply,
    tucker_reconstruct,
)


def _random_tucker(rng, dims, ranks):
    core = rng.standard_normal(ranks)
    factors = []
    for d, r in zip(dims, ranks):
        q, _ = np.linalg.qr(rng.standard_normal((d, r)))
        factors.append(q)
    x = core
    for k, u in enumerate(factors):
        x = np.moveaxis(
            np.moveaxis(x, k, -1) @ u.T, -1, k
        )
    return x, core, factors


def test_mode_multiply_matches_numpy(rng):
    t = rng.standard_normal((4, 5, 6))
    m = rng.standard_normal((3, 5))
    out = np.asarray(mode_multiply(jnp.asarray(t), jnp.asarray(m), 1))
    ref = np.einsum("ijk,lj->ilk", t, m)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_exact_recovery_low_multilinear_rank(rng):
    dims, ranks = (30, 20, 15), (3, 4, 2)
    x, _c, _f = _random_tucker(rng, dims, ranks)
    core, factors = hosvd(jnp.asarray(x), ranks)
    assert core.shape == ranks
    for u, d, r in zip(factors, dims, ranks):
        assert u.shape == (d, r)
        np.testing.assert_allclose(
            np.asarray(u).T @ np.asarray(u), np.eye(r), atol=1e-10
        )
    rec = np.asarray(tucker_reconstruct(core, factors))
    np.testing.assert_allclose(rec, x, atol=1e-9)


def test_hooi_improves_on_hosvd_for_truncation(rng):
    # full-rank noisy tensor truncated to small multilinear rank: HOOI's
    # alternating updates must not be worse than plain HOSVD
    # plant a strong rank-(2,2,2) signal over full-rank noise (amplitude
    # such that the signal's Frobenius norm exceeds the noise's)
    x = rng.standard_normal((20, 18, 16))
    x += 30.0 * _random_tucker(rng, (20, 18, 16), (2, 2, 2))[0]
    ranks = (2, 2, 2)
    c1, f1 = hosvd(jnp.asarray(x), ranks, key=1)
    c2, f2 = hooi(jnp.asarray(x), ranks, n_sweeps=3, key=1)
    e1 = np.linalg.norm(np.asarray(tucker_reconstruct(c1, f1)) - x)
    e2 = np.linalg.norm(np.asarray(tucker_reconstruct(c2, f2)) - x)
    assert e2 <= e1 * (1 + 1e-9), (e1, e2)
    # and both capture the planted rank-(2,2,2) signal reasonably
    assert e2 < 0.9 * np.linalg.norm(x)


def test_core_energy_equals_captured_norm(rng):
    # orthonormal factors: ||core||_F^2 == ||projection of x||_F^2
    x, _c, _f = _random_tucker(rng, (12, 10, 8), (3, 3, 3))
    core, factors = hosvd(jnp.asarray(x), (3, 3, 3))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(core)), np.linalg.norm(x), rtol=1e-9
    )


def test_rank_validation(rng):
    with pytest.raises(ValueError, match="ranks"):
        hosvd(jnp.asarray(rng.standard_normal((4, 5, 6))), (2, 2))


def test_over_large_ranks_raise(rng):
    x = jnp.asarray(rng.standard_normal((3, 18, 16)))
    with pytest.raises(ValueError, match=r"ranks\[0\]"):
        hosvd(x, (8, 2, 2))          # 8 > mode-0 dimension 3
    x2 = jnp.asarray(rng.standard_normal((20, 18, 16)))
    with pytest.raises(ValueError, match="prod"):
        hooi(x2, (8, 2, 2))          # 8 > 2*2: unreachable Tucker rank
    # hosvd allows it (its unfoldings are full-width), shape as promised
    c, f = hosvd(x2, (8, 2, 2))
    assert c.shape == (8, 2, 2)
