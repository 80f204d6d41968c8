"""Gappy POD (ops/gappy) — extension tests.

Oracles: exact on-span reconstruction (the defining gappy-POD property);
numpy lstsq per snapshot; masked-low-rank recovery with observed entries
kept verbatim; Sherman-Morrison oversampling must reduce the sensor
pseudo-inverse amplification monotonically in expectation.
"""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.deim import deim_points
from corrla_rs_tpu.ops.gappy import (gappy_pod_fill, gappy_reconstruct,
                                     oversample_points)


def _pod_modes(rng, n=400, r=6, m=50):
    t = np.linspace(0, 1, m)
    x = np.linspace(0, 1, n)
    snaps = np.stack(
        [np.sin((k + 1) * np.pi * x[:, None] + t[None, :]) *
         np.exp(-k * t[None, :]) for k in range(8)]
    ).sum(0) + 0.01 * rng.standard_normal((n, m))
    u, s, vt = np.linalg.svd(snaps, full_matrices=False)
    return u[:, :r], snaps


def test_exact_on_span_at_deim_points(rng):
    u, _ = _pod_modes(rng)
    pts, _ = deim_points(jnp.asarray(u))
    c_true = rng.standard_normal(u.shape[1])
    x = u @ c_true
    x_hat, c = gappy_reconstruct(jnp.asarray(u), pts, jnp.asarray(x[np.asarray(pts)]))
    np.testing.assert_allclose(np.asarray(x_hat), x, atol=1e-9)
    np.testing.assert_allclose(np.asarray(c), c_true, atol=1e-9)


def test_matches_numpy_lstsq_oversampled(rng):
    u, _ = _pod_modes(rng)
    pts = rng.choice(u.shape[0], size=25, replace=False)
    vals = rng.standard_normal(25)
    _x_hat, c = gappy_reconstruct(jnp.asarray(u), jnp.asarray(pts),
                                  jnp.asarray(vals))
    c_np, *_ = np.linalg.lstsq(u[pts], vals, rcond=None)
    np.testing.assert_allclose(np.asarray(c), c_np, atol=1e-9)


def test_batched_columns_match_single(rng):
    u, _ = _pod_modes(rng)
    pts = rng.choice(u.shape[0], size=20, replace=False)
    vals = rng.standard_normal((20, 7))
    xb, cb = gappy_reconstruct(jnp.asarray(u), jnp.asarray(pts),
                               jnp.asarray(vals))
    for j in range(7):
        xj, cj = gappy_reconstruct(jnp.asarray(u), jnp.asarray(pts),
                                   jnp.asarray(vals[:, j]))
        np.testing.assert_allclose(np.asarray(xb[:, j]), np.asarray(xj),
                                   atol=1e-11)
        np.testing.assert_allclose(np.asarray(cb[:, j]), np.asarray(cj),
                                   atol=1e-11)


def test_oversampling_beats_minimal_under_noise(rng):
    u, _ = _pod_modes(rng)
    r = u.shape[1]
    pts_r, _ = deim_points(jnp.asarray(u))
    pts_s = oversample_points(jnp.asarray(u), pts_r, 24)
    c_true = rng.standard_normal(r)
    x = u @ c_true
    errs = {"min": [], "over": []}
    for trial in range(20):
        noise = 0.05 * rng.standard_normal(u.shape[0])
        xn = x + noise
        xr, _ = gappy_reconstruct(jnp.asarray(u), pts_r,
                                  jnp.asarray(xn[np.asarray(pts_r)]))
        xs, _ = gappy_reconstruct(jnp.asarray(u), pts_s,
                                  jnp.asarray(xn[np.asarray(pts_s)]))
        errs["min"].append(np.linalg.norm(np.asarray(xr) - x))
        errs["over"].append(np.linalg.norm(np.asarray(xs) - x))
    assert np.mean(errs["over"]) < np.mean(errs["min"])


def test_oversample_points_unique_and_reduce_amplification(rng):
    u, _ = _pod_modes(rng)
    pts_r, _ = deim_points(jnp.asarray(u))
    pts_s = np.asarray(oversample_points(jnp.asarray(u), pts_r, 30))
    assert len(set(pts_s.tolist())) == len(pts_s)
    amp_r = np.linalg.norm(np.linalg.pinv(u[np.asarray(pts_r)]), 2)
    amp_s = np.linalg.norm(np.linalg.pinv(u[pts_s]), 2)
    assert amp_s < amp_r


def test_ridge_path_close_to_exact(rng):
    u, _ = _pod_modes(rng)
    pts = rng.choice(u.shape[0], size=30, replace=False)
    c_true = rng.standard_normal(u.shape[1])
    x = u @ c_true
    x_hat, _ = gappy_reconstruct(jnp.asarray(u), jnp.asarray(pts),
                                 jnp.asarray(x[pts]), ridge=1e-8)
    np.testing.assert_allclose(np.asarray(x_hat), x, atol=1e-5)


def test_gappy_fill_recovers_low_rank(rng):
    n, m, r = 120, 60, 4
    a = rng.standard_normal((n, r)) @ rng.standard_normal((r, m))
    mask = rng.random((n, m)) > 0.3            # 70% observed
    filled, modes, sig = gappy_pod_fill(jnp.asarray(a),
                                        jnp.asarray(mask), rank=r,
                                        n_sweeps=60)
    filled = np.asarray(filled)
    # observed entries verbatim
    np.testing.assert_array_equal(filled[mask], a[mask])
    # missing entries recovered
    err = np.linalg.norm((filled - a)[~mask]) / np.linalg.norm(a[~mask])
    assert err < 1e-6, err
    assert modes.shape == (n, r)
    assert np.all(np.diff(np.asarray(sig)) <= 0)


def test_gappy_fill_beats_mean_fill(rng):
    n, m, r = 100, 50, 3
    a = rng.standard_normal((n, r)) @ rng.standard_normal((r, m))
    a = a + 0.01 * rng.standard_normal((n, m))
    mask = rng.random((n, m)) > 0.25
    filled, _, _ = gappy_pod_fill(jnp.asarray(a), jnp.asarray(mask),
                                  rank=r, n_sweeps=40)
    mean_fill = np.where(mask, a,
                         (np.where(mask, a, 0).sum(1) /
                          np.maximum(mask.sum(1), 1))[:, None])
    err_g = np.linalg.norm((np.asarray(filled) - a)[~mask])
    err_m = np.linalg.norm((mean_fill - a)[~mask])
    assert err_g < 0.2 * err_m
