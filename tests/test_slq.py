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
