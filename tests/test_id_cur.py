"""Interpolative / CUR decompositions (ops/id_cur) vs SVD oracles."""
import numpy as np
import pytest

from corrla_rs_tpu.ops.id_cur import column_id, cur, row_id


def _lowrank(rng, m, n, k, decay=None):
    """Rank-k (or decaying-spectrum) test matrix with known SVD error."""
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    if decay is None:
        s = np.zeros(min(m, n))
        s[:k] = np.linspace(10.0, 1.0, k)
    else:
        s = decay ** np.arange(min(m, n))
    return (u * s) @ v.T, s


def test_column_id_exact_on_lowrank(rng):
    a, _ = _lowrank(rng, 60, 40, 7)
    cols, x = column_id(a, 7, key=0)
    cols, x = np.asarray(cols), np.asarray(x)
    assert len(set(cols.tolist())) == 7
    np.testing.assert_allclose(x[:, cols], np.eye(7), atol=1e-12)
    err = np.linalg.norm(a[:, cols] @ x - a) / np.linalg.norm(a)
    assert err < 1e-9


def test_row_id_exact_on_lowrank(rng):
    a, _ = _lowrank(rng, 50, 70, 6)
    rows, z = row_id(a, 6, key=1)
    rows, z = np.asarray(rows), np.asarray(z)
    assert len(set(rows.tolist())) == 6
    np.testing.assert_allclose(z[rows, :], np.eye(6), atol=1e-12)
    err = np.linalg.norm(z @ a[rows, :] - a) / np.linalg.norm(a)
    assert err < 1e-9


@pytest.mark.parametrize("k", [5, 15])
def test_column_id_tracks_svd_error(rng, k):
    # decaying spectrum: ID error must be within a small factor of the
    # optimal rank-k error sigma_{k+1} * sqrt(remaining energy)
    a, s = _lowrank(rng, 80, 60, None, decay=0.7)
    cols, x = column_id(a, k, n_iter=3, key=2)
    err = np.linalg.norm(a[:, np.asarray(cols)] @ np.asarray(x) - a)
    svd_err = np.linalg.norm(s[k:])
    assert err < 10.0 * svd_err


def test_cur_skeleton_exact_on_lowrank(rng):
    a, _ = _lowrank(rng, 45, 55, 5)
    rows, cols, u = cur(a, 5, key=3, method="skeleton")
    rows, cols, u = map(np.asarray, (rows, cols, u))
    approx = a[:, cols] @ u @ a[rows, :]
    assert np.linalg.norm(approx - a) / np.linalg.norm(a) < 1e-8


@pytest.mark.slow
def test_cur_stable_beats_skeleton_under_noise(rng):
    a, _ = _lowrank(rng, 80, 60, 8)
    noisy = a + 1e-3 * rng.standard_normal(a.shape)

    def relerr(method):
        rows, cols, u = cur(noisy, 8, key=4, method=method)
        rows, cols, u = map(np.asarray, (rows, cols, u))
        approx = noisy[:, cols] @ u @ noisy[rows, :]
        return np.linalg.norm(approx - a) / np.linalg.norm(a)

    e_stable = relerr("stable")
    e_skel = relerr("skeleton")
    # noise floor: ||E||_F/||A||_F = 1e-3*sqrt(80*60)/17 ~ 4e-3
    assert e_stable < 1e-2
    assert e_stable <= e_skel + 1e-12


@pytest.mark.slow
def test_wide_and_tall_and_f32(rng):
    a, _ = _lowrank(rng, 30, 100, 4)   # wide
    cols, x = column_id(a.astype(np.float32), 4, key=5)
    err = np.linalg.norm(
        a[:, np.asarray(cols)] @ np.asarray(x, dtype=np.float64) - a
    ) / np.linalg.norm(a)
    assert err < 1e-4
    rows, z = row_id(a.T.astype(np.float32), 4, key=6)  # tall
    err = np.linalg.norm(
        np.asarray(z, dtype=np.float64) @ a.T[np.asarray(rows), :] - a.T
    ) / np.linalg.norm(a)
    assert err < 1e-4


def test_validation(rng):
    a = rng.standard_normal((10, 8))
    with pytest.raises(ValueError, match="rank"):
        column_id(a, 0)
    with pytest.raises(ValueError, match="rank"):
        column_id(a, 9)
    with pytest.raises(ValueError, match="method"):
        cur(a, 2, method="bogus")
