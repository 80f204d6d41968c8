"""CP/PARAFAC decomposition (ops/cp).

EXTENSION tests — oracles: exact recovery of a planted low-CP-rank
tensor (fit -> 1, factor congruence -> 1 up to permutation/scale, the
Kruskal-uniqueness regime), monotone fit history, reconstruction
identity, and a 4-way case.
"""
import numpy as np
import pytest

from corrla_rs_tpu import cp_als, cp_reconstruct


def _planted(rng, shape=(20, 16, 12), r=3):
    factors = [rng.standard_normal((s, r)) for s in shape]
    w = np.array([3.0, 2.0, 1.0])[:r]
    t = np.einsum("ir,jr,kr,r->ijk", *factors, w)
    return t, factors, w


def _congruence(a, b):
    """max-correspondence factor congruence |cos| matrix -> best match
    per true column."""
    an = a / np.linalg.norm(a, axis=0)
    bn = b / np.linalg.norm(b, axis=0)
    c = np.abs(an.T @ bn)
    return c.max(axis=1)


def test_cp_exact_recovery(rng):
    t, f_true, w_true = _planted(rng)
    w, factors, fits = cp_als(t, 3, n_sweeps=80, key=1)
    assert float(fits[-1]) > 1 - 1e-8
    rec = np.asarray(cp_reconstruct(w, factors))
    assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 1e-7
    # factors match up to permutation/sign (Kruskal uniqueness)
    for ft, fh in zip(f_true, factors):
        assert np.all(_congruence(ft, np.asarray(fh)) > 1 - 1e-6)
    # weights sorted descending
    w = np.asarray(w)
    assert np.all(np.diff(w) <= 1e-12)


@pytest.mark.slow
def test_cp_fit_history_monotone(rng):
    t, _, _ = _planted(rng, shape=(12, 10, 8), r=2)
    t = t + 0.01 * rng.standard_normal(t.shape)
    _, _, fits = cp_als(t, 2, n_sweeps=40, key=2)
    fits = np.asarray(fits)
    assert np.all(np.diff(fits) > -1e-9)   # monotone up to roundoff
    assert fits[-1] > 0.99


@pytest.mark.slow
def test_cp_four_way(rng):
    shape, r = (9, 8, 7, 6), 2
    f = [rng.standard_normal((s, r)) for s in shape]
    t = np.einsum("ir,jr,kr,lr->ijkl", *f)
    w, factors, fits = cp_als(t, r, n_sweeps=80, key=3)
    assert float(fits[-1]) > 1 - 1e-7
    rec = np.asarray(cp_reconstruct(w, factors))
    np.testing.assert_allclose(rec, t, atol=1e-6 * np.abs(t).max())


def test_cp_validation(rng):
    with pytest.raises(ValueError, match="2-way"):
        cp_als(np.zeros(5), 2)
    with pytest.raises(ValueError, match="rank"):
        cp_als(np.zeros((3, 3)), 0)


@pytest.mark.slow
def test_cp_degenerate_inputs(rng):
    # zero tensor: clean zero model, no NaN
    w, factors, fits = cp_als(np.zeros((4, 5, 6)), 2, n_sweeps=5)
    assert np.all(np.asarray(w) == 0)
    assert np.all(np.isfinite(np.asarray(fits)))
    # over-ranked fit (rank > true CP rank): finite everywhere
    f = [rng.standard_normal((s, 2)) for s in (10, 9, 8)]
    t = np.einsum("ir,jr,kr->ijk", *f)
    w, factors, fits = cp_als(t, 5, n_sweeps=60)
    assert np.all(np.isfinite(np.asarray(fits)))
    for fh in factors:
        assert np.all(np.isfinite(np.asarray(fh)))
    assert float(fits[-1]) > 1 - 1e-6
