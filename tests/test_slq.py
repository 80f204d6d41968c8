"""Stochastic Lanczos quadrature vs dense oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.slq import lanczos_tridiag, slq_logdet, slq_spectral_sum


def _spd(n, cond, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return jnp.asarray(q * eigs @ q.T)


def test_logdet_well_conditioned():
    a = _spd(300, 1e3, 0)
    truth = float(np.linalg.slogdet(np.asarray(a))[1])
    est = slq_logdet(a, n_probes=30, n_lanczos=50, key=1)
    assert est == pytest.approx(truth, rel=2e-2)


@pytest.mark.slow
def test_logdet_moderately_ill():
    a = _spd(200, 1e6, 1)
    truth = float(np.linalg.slogdet(np.asarray(a))[1])
    est = slq_logdet(a, n_probes=40, n_lanczos=80, key=2)
    # |logdet| ~ 1382; SLQ should land within a few percent
    assert est == pytest.approx(truth, rel=5e-2)


def test_trace_inverse():
    a = _spd(200, 1e2, 3)
    truth = float(np.trace(np.linalg.inv(np.asarray(a))))
    est = slq_spectral_sum(a, lambda x: 1.0 / x, n_probes=40,
                           n_lanczos=60, key=4)
    assert est == pytest.approx(truth, rel=3e-2)


@pytest.mark.slow
def test_matrix_free_callable():
    """Matrix-free operator parity: same estimate as the explicit matrix
    at the same key (identical probes and arithmetic path)."""
    a = _spd(150, 1e2, 5)

    def matvec(block):
        return a @ block

    e1 = slq_logdet(a, n_probes=16, n_lanczos=40, key=6)
    e2 = slq_logdet(matvec, n_probes=16, n_lanczos=40, key=6,
                    n_dim=150, dtype=a.dtype)
    assert e1 == pytest.approx(e2, rel=1e-10)


def test_lanczos_exact_eigenvalues_small():
    """With m = n and one probe, Lanczos+reorth reproduces the full
    spectrum: quadrature nodes == eigenvalues."""
    a = _spd(12, 1e2, 7)
    v = jnp.ones((12, 1)) / np.sqrt(12.0)
    al, be = lanczos_tridiag(a, v, 12)
    t = np.diag(np.asarray(al[:, 0])) + np.diag(np.asarray(be[:, 0]), 1) \
        + np.diag(np.asarray(be[:, 0]), -1)
    nodes = np.linalg.eigvalsh(t)
    truth = np.linalg.eigvalsh(np.asarray(a))
    np.testing.assert_allclose(nodes, truth, rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_gp_evidence_use_case():
    """The motivating application: N(0, K + s2 I) log-marginal-likelihood
    of n=400 points, logdet term via SLQ vs Cholesky."""
    rng = np.random.default_rng(8)
    x = np.sort(rng.uniform(0, 10, 400))
    k = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 0.5 ** 2)
    a = jnp.asarray(k + 0.1 * np.eye(400))
    truth = 2.0 * float(np.sum(np.log(np.diag(np.linalg.cholesky(
        np.asarray(a))))))
    est = slq_logdet(a, n_probes=40, n_lanczos=60, key=9)
    assert est == pytest.approx(truth, rel=3e-2, abs=3.0)


def test_validation():
    a = jnp.eye(4)
    with pytest.raises(ValueError, match="n_probes"):
        slq_logdet(a, n_probes=0)
    with pytest.raises(ValueError, match="n_lanczos"):
        slq_logdet(a, n_lanczos=1)
    with pytest.raises(ValueError, match="n_dim"):
        slq_logdet(lambda b: b)
    with pytest.raises(ValueError, match="square"):
        slq_logdet(jnp.ones((3, 4)))


@pytest.mark.slow
def test_lanczos_fn_apply_matrix_functions():
    """f(A) b vs dense eigendecomposition oracles: exp, inverse, sqrt."""
    from scipy.linalg import expm, sqrtm

    from corrla_rs_tpu.ops.slq import lanczos_fn_apply

    a = _spd(150, 1e2, 11)
    an = np.asarray(a)
    rng = np.random.default_rng(12)
    b = jnp.asarray(rng.standard_normal((150, 3)))

    y_exp = lanczos_fn_apply(a, b, jnp.exp, n_lanczos=60)
    np.testing.assert_allclose(np.asarray(y_exp), expm(an) @ np.asarray(b),
                               rtol=1e-8, atol=1e-10)
    y_inv = lanczos_fn_apply(a, b, lambda x: 1.0 / x, n_lanczos=100)
    np.testing.assert_allclose(np.asarray(y_inv),
                               np.linalg.solve(an, np.asarray(b)),
                               rtol=1e-6, atol=1e-8)
    y_sq = lanczos_fn_apply(a, b[:, 0], jnp.sqrt, n_lanczos=100)
    np.testing.assert_allclose(np.asarray(y_sq),
                               np.real(sqrtm(an)) @ np.asarray(b[:, 0]),
                               rtol=1e-6, atol=1e-8)
    # exactness at m = n on a tiny system
    a4 = _spd(6, 10, 13)
    y = lanczos_fn_apply(a4, jnp.ones(6), jnp.exp, n_lanczos=6)
    np.testing.assert_allclose(np.asarray(y),
                               expm(np.asarray(a4)) @ np.ones(6),
                               rtol=1e-10)


@pytest.mark.slow
def test_nystrom_pcg_accelerates():
    """Frangella-Tropp-Udell: Nystrom PCG on a regularized fast-decay
    kernel system converges in far fewer iterations than plain CG."""
    from corrla_rs_tpu.ops.cg import cg_solve, nystrom_preconditioner

    rng = np.random.default_rng(14)
    x = np.sort(rng.uniform(0, 10, 400))
    k = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 1.0)
    mu = 1e-6
    a = jnp.asarray(k + mu * np.eye(400))
    b = jnp.asarray(rng.standard_normal(400))

    def iters_to_tol(res, tol=1e-8):
        rel = np.asarray(res.residual_norms[:, 0]) / float(
            jnp.linalg.norm(b))
        hit = np.nonzero(rel <= tol)[0]
        return int(hit[0]) if hit.size else 10 ** 9

    plain = cg_solve(a, b, n_iters=400, tol=1e-10)
    pre = nystrom_preconditioner(jnp.asarray(k), rank=60, mu=mu, key=15)
    fast = cg_solve(a, b, n_iters=400, tol=1e-10, preconditioner=pre)
    # cond(A) ~ 1e8: a dense-solve oracle carries ~1e-2 absolute error
    # itself, so assert on the residual (the quantity CG controls)
    rel_res = float(jnp.linalg.norm(a @ fast.x - b)
                    / jnp.linalg.norm(b))
    assert rel_res < 1e-8
    # measured: 248 plain iterations -> 2 preconditioned
    assert iters_to_tol(fast) < 0.1 * iters_to_tol(plain)
