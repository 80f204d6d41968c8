"""Batched PCG vs dense solves."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.cg import CgResult, cg_solve, jacobi_preconditioner


def _spd(n, cond, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return q * eigs @ q.T


def test_single_rhs_exact():
    a = _spd(120, 1e3, 0)
    x_true = np.random.default_rng(1).standard_normal(120)
    b = a @ x_true
    res = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=200, tol=1e-10)
    assert isinstance(res, CgResult)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-7)
    assert bool(res.converged)
    # residual trace is recorded and ends tiny
    assert res.residual_norms.shape == (201,  1)
    assert float(res.residual_norms[-1, 0]) < 1e-9 * np.linalg.norm(b)


def test_multi_rhs_batched():
    a = _spd(100, 1e2, 2)
    x_true = np.random.default_rng(3).standard_normal((100, 5))
    b = a @ x_true
    res = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=150, tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-8)
    assert bool(jnp.all(res.converged))


def test_matrix_free_parity():
    a = _spd(80, 1e2, 4)
    b = np.random.default_rng(5).standard_normal(80)

    def matvec(block):
        return jnp.asarray(a) @ block

    r1 = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=100)
    r2 = cg_solve(matvec, jnp.asarray(b), n_iters=100)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x),
                               rtol=1e-12)


def test_jacobi_preconditioner_accelerates():
    """Strongly diagonal-scaled SPD system: Jacobi reaches tol in far
    fewer effective iterations (masked columns freeze, so compare the
    first iteration whose residual crosses tol)."""
    rng = np.random.default_rng(6)
    d = np.geomspace(1.0, 1e4, 150)
    q, _ = np.linalg.qr(rng.standard_normal((150, 150)))
    a = np.diag(d) + 0.1 * (q * 1.0) @ np.diag(
        np.linspace(1, 2, 150)) @ q.T
    a = (a + a.T) / 2 + 1.0 * np.eye(150)  # SPD, wildly scaled diagonal
    b = rng.standard_normal(150)

    def iters_to_tol(res, tol=1e-8):
        rel = np.asarray(res.residual_norms[:, 0]) / np.linalg.norm(b)
        hit = np.nonzero(rel <= tol)[0]
        return int(hit[0]) if hit.size else 10**9

    plain = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=400,
                     tol=1e-10)
    pre = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=400,
                   tol=1e-10,
                   preconditioner=jacobi_preconditioner(jnp.asarray(a)))
    assert iters_to_tol(pre) < 0.7 * iters_to_tol(plain)
    np.testing.assert_allclose(np.asarray(pre.x),
                               np.linalg.solve(a, b), atol=1e-7)


def test_mask_freezes_converged_columns():
    """One easy and one hard column: the easy one converges early and its
    solution must not drift during the hard one's remaining iterations."""
    a = _spd(90, 1e3, 7)
    # easy: dominant-eigenvector RHS (one-dimensional Krylov space);
    # hard: full-spectrum random RHS
    w, v = np.linalg.eigh(np.asarray(a))
    easy = np.asarray(a) @ v[:, -1]
    hard = np.random.default_rng(8).standard_normal(90)
    b = np.stack([easy, hard], axis=1)
    res = cg_solve(jnp.asarray(a), jnp.asarray(b), n_iters=300, tol=1e-9)
    sol = np.linalg.solve(np.asarray(a), b)
    np.testing.assert_allclose(np.asarray(res.x), sol, atol=1e-5)
    assert bool(jnp.all(res.converged))
    # the easy column crossed tol strictly earlier than the hard one
    rel = np.asarray(res.residual_norms) / np.linalg.norm(b, axis=0)
    first_hit = [int(np.nonzero(rel[:, j] <= 1e-9)[0][0]) for j in (0, 1)]
    assert first_hit[0] < first_hit[1]
    # and its solution did not drift after freezing
    np.testing.assert_allclose(np.asarray(res.x[:, 0]), sol[:, 0],
                               atol=1e-8)


def test_validation():
    a = jnp.eye(4)
    with pytest.raises(ValueError, match="n_iters"):
        cg_solve(a, jnp.ones(4), n_iters=0)
    with pytest.raises(ValueError, match="x0"):
        cg_solve(a, jnp.ones(4), x0=jnp.ones(3))
