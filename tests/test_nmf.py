"""Nonnegative matrix factorization (HALS + NNDSVD init).

EXTENSION tests — oracles: near-exact recovery of planted nonnegative
low-rank data, reconstruction-error parity with sklearn's NMF at the
same rank, nonnegativity invariants, non-increasing error history.
"""
import numpy as np
import pytest

from corrla_rs_tpu import nmf


def _planted(rng, m=60, n=45, r=4):
    w = rng.random((m, r))
    h = rng.random((r, n))
    return w @ h


def test_recovers_planted_nonneg_lowrank(rng):
    x = _planted(rng)
    # NMF converges LINEARLY (sklearn's CD also needs thousands of
    # iterations on this data); budget accordingly
    w, h, errs = nmf(x, 4, n_sweeps=2000)
    assert np.all(np.asarray(w) >= 0) and np.all(np.asarray(h) >= 0)
    assert float(errs[-1]) < 1e-4
    rec = np.asarray(w) @ np.asarray(h)
    assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-4
    # error history non-increasing (HALS is monotone)
    e = np.asarray(errs)
    assert np.all(np.diff(e) <= 1e-10)


@pytest.mark.filterwarnings(
    "ignore::sklearn.exceptions.ConvergenceWarning")
def test_parity_with_sklearn(rng):
    from sklearn.decomposition import NMF as SkNMF

    x = _planted(rng, m=80, n=50, r=6) + 0.01 * rng.random((80, 50))
    w, h, errs = nmf(x, 6, n_sweeps=1000)
    err_ours = float(errs[-1])
    sk = SkNMF(n_components=6, init="nndsvda", max_iter=1000, tol=1e-10)
    w_sk = sk.fit_transform(x)
    err_sk = np.linalg.norm(x - w_sk @ sk.components_) / \
        np.linalg.norm(x)
    assert err_ours <= 1.15 * err_sk


def test_nmf_validation(rng):
    with pytest.raises(ValueError, match="2-d"):
        nmf(np.ones(4), 2)
    with pytest.raises(ValueError, match="nonnegative"):
        nmf(np.array([[1.0, -0.1], [0.2, 0.3]]), 1)
    with pytest.raises(ValueError, match="rank"):
        nmf(np.ones((4, 4)), 0)
