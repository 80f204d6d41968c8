"""Robust PCA / principal component pursuit (Candes et al. 2011).

EXTENSION tests — oracle: the exact-recovery guarantee on synthetic
low-rank + sparse data, plus the contrast with classical (L2) PCA
which one gross outlier destroys.
"""
import numpy as np
import pytest

from corrla_rs_tpu import robust_pca


def _low_rank_plus_sparse(rng, m=120, n=80, r=4, frac=0.05, amp=10.0):
    l_true = (rng.standard_normal((m, r)) / np.sqrt(m)) @ \
        (rng.standard_normal((r, n)) / np.sqrt(n)) * np.sqrt(m * n / r)
    mask = rng.random((m, n)) < frac
    s_true = np.where(mask, amp * rng.choice([-1.0, 1.0], (m, n)), 0.0)
    return l_true + s_true, l_true, s_true


def test_exact_recovery(rng):
    m_mat, l_true, s_true = _low_rank_plus_sparse(rng)
    l_hat, s_hat, info = robust_pca(m_mat)
    rel_l = np.linalg.norm(np.asarray(l_hat) - l_true) / \
        np.linalg.norm(l_true)
    assert rel_l < 1e-5
    assert info["rank"] == 4
    # recovered support matches the planted corruption
    sup_hat = np.abs(np.asarray(s_hat)) > 1e-3
    sup_true = s_true != 0
    assert np.mean(sup_hat == sup_true) > 0.999
    assert info["rel_residual"] < 1e-7


def test_beats_classical_pca_under_outliers(rng):
    m_mat, l_true, _ = _low_rank_plus_sparse(rng, frac=0.08, amp=50.0)
    l_hat, _, _ = robust_pca(m_mat)
    # rank-4 truncated SVD of the corrupted matrix (classical PCA)
    u, s, vt = np.linalg.svd(m_mat, full_matrices=False)
    l_pca = (u[:, :4] * s[:4]) @ vt[:4]
    err_rpca = np.linalg.norm(np.asarray(l_hat) - l_true)
    err_pca = np.linalg.norm(l_pca - l_true)
    assert err_rpca < 0.02 * err_pca


def test_validation_and_edge_cases(rng):
    with pytest.raises(ValueError, match="2-d"):
        robust_pca(np.zeros(5))
    with pytest.raises(ValueError, match="lam"):
        robust_pca(np.zeros((4, 4)), lam=-1.0)
    l_hat, s_hat, info = robust_pca(np.zeros((6, 5)))
    assert info["rank"] == 0 and info["iterations"] == 0
    # no corruption: S stays small (the convex relaxation shaves a
    # ~0.1% sliver into S at the finite-lambda optimum), L ~= M
    m_clean = rng.standard_normal((40, 5)) @ rng.standard_normal((5, 30))
    l_hat, s_hat, info = robust_pca(m_clean)
    m_norm = np.linalg.norm(m_clean)
    assert np.linalg.norm(np.asarray(s_hat)) < 5e-3 * m_norm
    assert np.linalg.norm(np.asarray(l_hat) - m_clean) < 5e-3 * m_norm
    assert info["rank"] == 5


def test_max_iter_validation():
    with pytest.raises(ValueError, match="max_iter"):
        robust_pca(np.ones((4, 4)), max_iter=0)
