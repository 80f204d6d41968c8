"""Low-rank matrix completion (ALS with spectral init).

EXTENSION tests — oracle: the exact-recovery regime (incoherent
low-rank, enough observations): held-out entries recovered to f64
working accuracy; plus the mean-fill baseline comparison and masking
semantics (unobserved values must not influence the fit).
"""
import numpy as np
import pytest

from corrla_rs_tpu import matrix_complete


def _problem(rng, m=80, n=60, r=4, frac=0.35):
    l_true = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    mask = rng.random((m, n)) < frac
    return l_true, mask


def test_exact_recovery_heldout(rng):
    l_true, mask = _problem(rng)
    m_in = np.where(mask, l_true, 0.0)
    # noise-free data: drop the ridge to its floor (held-out error
    # tracks ~13x lam; the 1e-6 default is for noisy practice)
    m_hat, u, v, hist = matrix_complete(m_in, mask, 4, n_sweeps=40,
                                        lam=1e-10)
    held = ~mask
    err = np.linalg.norm((np.asarray(m_hat) - l_true)[held]) / \
        np.linalg.norm(l_true[held])
    assert err < 1e-6
    h = np.asarray(hist)
    assert h[-1] < 1e-8            # observed RMSE driven to ~0
    assert np.all(np.diff(h) < 1e-10)  # non-increasing


def test_unobserved_values_ignored(rng):
    l_true, mask = _problem(rng, frac=0.5)
    junk = 1e6 * rng.standard_normal(l_true.shape)
    m_a = np.where(mask, l_true, 0.0)
    m_b = np.where(mask, l_true, junk)   # garbage at unobserved slots
    ha, *_ = matrix_complete(m_a, mask, 4, n_sweeps=25, key=1)
    hb, *_ = matrix_complete(m_b, mask, 4, n_sweeps=25, key=1)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb),
                               atol=1e-10)


def test_beats_mean_fill(rng):
    l_true, mask = _problem(rng, frac=0.3)
    noisy = l_true + 0.01 * rng.standard_normal(l_true.shape)
    m_in = np.where(mask, noisy, 0.0)
    m_hat, *_ = matrix_complete(m_in, mask, 4, n_sweeps=40)
    held = ~mask
    err_als = np.linalg.norm((np.asarray(m_hat) - l_true)[held])
    mean_fill = np.full_like(l_true, noisy[mask].mean())
    err_mean = np.linalg.norm((mean_fill - l_true)[held])
    assert err_als < 0.05 * err_mean


def test_completion_validation(rng):
    with pytest.raises(ValueError, match="2-d"):
        matrix_complete(np.zeros(4), np.zeros(4), 1)
    with pytest.raises(ValueError, match="mask shape"):
        matrix_complete(np.zeros((4, 4)), np.zeros((3, 4)), 1)
    with pytest.raises(ValueError, match="rank"):
        matrix_complete(np.zeros((4, 4)), np.ones((4, 4)), 0)
    with pytest.raises(ValueError, match="no observed"):
        matrix_complete(np.zeros((4, 4)), np.zeros((4, 4)), 1)


def test_nan_markers_and_int_input(rng):
    # NaN is the canonical missing marker: must be ignored, not poison
    l_true, mask = _problem(rng, frac=0.4)
    m_nan = np.where(mask, l_true, np.nan)
    m_hat, *_ , hist = matrix_complete(m_nan, mask, 4, n_sweeps=30,
                                       lam=1e-10)
    assert np.all(np.isfinite(np.asarray(m_hat)))
    held = ~mask
    err = np.linalg.norm((np.asarray(m_hat) - l_true)[held]) / \
        np.linalg.norm(l_true[held])
    assert err < 1e-6
    # integer ratings input: promoted to float, no scan dtype crash
    ratings = rng.integers(1, 6, size=(30, 20))
    msk2 = rng.random((30, 20)) < 0.6
    m_hat2, *_ = matrix_complete(np.where(msk2, ratings, 0), msk2, 3)
    assert np.all(np.isfinite(np.asarray(m_hat2)))


def test_sharded_same_answer(rng):
    from corrla_rs_tpu.parallel.mesh import make_mesh

    l_true, _ = _problem(rng, m=160, n=48, frac=0.45)
    mask = rng.random((160, 48)) < 0.45
    m_in = np.where(mask, l_true, 0.0)
    h1, *_ = matrix_complete(m_in, mask, 4, n_sweeps=25, key=2)
    h8, *_ = matrix_complete(m_in, mask, 4, n_sweeps=25, key=2,
                             mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1),
                               rtol=1e-8, atol=1e-10)
