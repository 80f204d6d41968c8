"""Nystrom PSD eigendecomposition (ops/nystrom) vs dense eigh oracles."""
import numpy as np
import pytest

from corrla_rs_tpu.ops.nystrom import nystrom_approx, nystrom_eigh


def _rbf_kernel(rng, n, d=3, ell=1.0):
    pts = rng.standard_normal((n, d))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    return np.exp(-d2 / (2 * ell * ell))


def test_exact_on_lowrank_psd(rng):
    n, k = 80, 6
    g = rng.standard_normal((n, k))
    a = g @ g.T                       # exactly rank k
    evals, vecs = nystrom_eigh(a, k, key=0)
    evals, vecs = np.asarray(evals), np.asarray(vecs)
    ref = np.linalg.eigvalsh(a)[::-1][:k]
    np.testing.assert_allclose(evals, ref, rtol=1e-8)
    # residual ||A v - lambda v||
    res = a @ vecs - vecs * evals[None, :]
    assert np.max(np.abs(res)) < 1e-7 * evals[0]
    # orthonormal eigenvectors
    np.testing.assert_allclose(vecs.T @ vecs, np.eye(k), atol=1e-8)


def test_kernel_matrix_eigenvalues(rng):
    a = _rbf_kernel(rng, 200, d=2, ell=3.0)   # fast spectral decay
    r = 20
    evals, vecs = nystrom_eigh(a, r, n_oversamples=10, key=1)
    evals = np.asarray(evals)
    ref = np.linalg.eigvalsh(a)[::-1]
    # one-pass Nystrom error is bounded by the nuclear tail past the
    # sketch size l = r + oversamples (Tropp et al. 2017, thm 4.1)
    tail = ref[r + 10:].sum()
    np.testing.assert_allclose(evals[:10], ref[:10],
                               rtol=1e-6, atol=5 * tail)
    # the rank-r TRUNCATION of A_hat also pays the best-rank-r error
    approx = np.asarray(vecs) * evals[None, :] @ np.asarray(vecs).T
    best_r = np.linalg.norm(ref[r:])
    assert np.linalg.norm(a - approx) < 10 * best_r + 1e-10


def test_approx_factor(rng):
    a = _rbf_kernel(rng, 120, ell=2.0)
    f = np.asarray(nystrom_approx(a, 15, key=2))
    assert f.shape == (120, 15)
    ref = np.linalg.eigvalsh(a)[::-1]
    assert np.linalg.norm(a - f @ f.T) < 10 * np.linalg.norm(ref[15:]) + 1e-10


def test_f32_stability_tiny_spectrum(rng):
    # spectrum decaying below f32 eps: the shift must keep chol finite
    n = 60
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = (0.1 ** np.arange(n)).astype(np.float32)
    a = ((q * s) @ q.T).astype(np.float32)
    evals, vecs = nystrom_eigh(a, 5, key=3)
    evals = np.asarray(evals)
    assert np.all(np.isfinite(evals)) and np.all(np.isfinite(vecs))
    np.testing.assert_allclose(evals[:3], s[:3], rtol=1e-3)


def test_validation(rng):
    with pytest.raises(ValueError, match="square"):
        nystrom_eigh(rng.standard_normal((4, 5)), 2)
    with pytest.raises(ValueError, match="rank"):
        nystrom_eigh(np.eye(4), 0)
    with pytest.raises(ValueError, match="rank"):
        nystrom_eigh(np.eye(4), 5)
