"""Rank selection: Gavish-Donoho SVHT + HMT posterior range error.

EXTENSION tests — the reference takes rank as a user guess everywhere;
these pin the answers to "what rank does the data support?" and "does
this basis capture A to tolerance?".
"""
import numpy as np
import pytest

from corrla_rs_tpu import (
    adaptive_random_svd,
    range_error_estimate,
    random_svd,
    select_rank,
    svht_threshold,
)


def _lowrank_plus_noise(rng, m=400, n=200, r=12, snr=50.0, noise=0.02):
    u, _ = np.linalg.qr(rng.standard_normal((m, r)))
    v, _ = np.linalg.qr(rng.standard_normal((n, r)))
    s = np.linspace(snr, snr / 4, r) * noise * np.sqrt(max(m, n))
    x = (u * s) @ v.T + noise * rng.standard_normal((m, n))
    return x, r


def test_svht_recovers_true_rank_known_and_unknown_noise(rng):
    x, r_true = _lowrank_plus_noise(rng, noise=0.02)
    sigma = np.linalg.svd(x, compute_uv=False)
    # known noise level
    assert select_rank(sigma, x.shape, noise=0.02) == r_true
    # unknown noise: median calibration on the full spectrum
    assert select_rank(sigma, x.shape) == r_true
    # and on a generous-rank randomized spectrum (the practical flow)
    _, s_r, _ = random_svd(x, 60, 8, 8, key=1)
    assert select_rank(np.asarray(s_r), x.shape, noise=0.02) == r_true


def test_svht_threshold_monotone_in_noise():
    t1 = svht_threshold((400, 200), noise=0.01)
    t2 = svht_threshold((400, 200), noise=0.03)
    assert t2 == pytest.approx(3 * t1)
    with pytest.raises(ValueError, match="noise"):
        svht_threshold((400, 200))


def test_range_error_estimate_tracks_truth(rng):
    x, _ = _lowrank_plus_noise(rng)
    u, _, _ = random_svd(x, 12, 8, 8, key=0)
    est = range_error_estimate(x, u, n_probes=20, key=2)
    true = np.linalg.norm(
        x - np.asarray(u) @ (np.asarray(u).T @ x), 2
    )
    # probe max underestimates at most mildly and never by > the HMT
    # factor; in practice it brackets the truth within ~[0.5, 10]
    assert 0.3 * true < est < 10 * true
    with pytest.raises(ValueError, match="q must be"):
        range_error_estimate(x, np.zeros((7, 3)))


def test_adaptive_random_svd_meets_tolerance(rng):
    # effectively exact low-rank data (noise far below tol): the probe
    # estimate certifies residual ENERGY (see docstring — it sits near
    # the Frobenius norm on flat tails), so pick tol between the
    # post-truncation energy floor and the smallest kept direction
    m, n, r_true = 400, 200, 12
    qu, _ = np.linalg.qr(rng.standard_normal((m, r_true)))
    qv, _ = np.linalg.qr(rng.standard_normal((n, r_true)))
    x = (qu * np.linspace(4.0, 1.0, r_true)) @ qv.T
    x = x + 1e-9 * rng.standard_normal((m, n))
    tol = 0.1  # below sigma_min=1, above the 1e-9 noise energy
    u, s, vt, r, err = adaptive_random_svd(x, tol, rank0=2, key=3)
    assert err <= tol
    assert r_true <= r <= 4 * r_true
    rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(vt)
    assert np.linalg.norm(x - rec, 2) < tol
    # cap respected when the tolerance is unreachable
    *_, r_cap, _ = adaptive_random_svd(x, 1e-30, rank0=2, max_rank=16,
                                       key=3)
    assert r_cap == 16
    with pytest.raises(ValueError, match="tol"):
        adaptive_random_svd(x, 0.0)
