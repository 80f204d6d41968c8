"""DEIM sensor selection (ops/deim) — extension tests.

Oracle: a pure-numpy transcription of Chaturantabut & Sorensen (2010)
Algorithm 1, plus the exactness property (fields in span(U) reconstruct
exactly from the r selected points).
"""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.deim import deim_points, deim_reconstruct


def _deim_numpy(u):
    n, r = u.shape
    p = [int(np.argmax(np.abs(u[:, 0])))]
    for j in range(1, r):
        c = np.linalg.solve(u[np.ix_(p, range(j))], u[p, j])
        resid = u[:, j] - u[:, :j] @ c
        p.append(int(np.argmax(np.abs(resid))))
    return np.array(p)


def _pod_modes(rng, n=400, r=6):
    # orthonormal modes from a smooth random field family
    t = np.linspace(0, 1, 50)
    x = np.linspace(0, 1, n)
    snaps = np.stack(
        [np.sin((k + 1) * np.pi * x[:, None] + t[None, :]) *
         np.exp(-k * t[None, :]) for k in range(8)]
    ).sum(0) + 0.01 * rng.standard_normal((n, 50))
    u, _s, _vt = np.linalg.svd(snaps, full_matrices=False)
    return u[:, :r]


def test_matches_reference_algorithm(rng):
    u = _pod_modes(rng)
    pts, _proj = deim_points(jnp.asarray(u))
    np.testing.assert_array_equal(np.asarray(pts), _deim_numpy(u))


def test_exact_on_span(rng):
    u = _pod_modes(rng)
    pts, proj = deim_points(jnp.asarray(u))
    # any field in span(U): reconstruction from r samples is exact
    coeffs = rng.standard_normal((6, 5))
    fields = u @ coeffs                          # (n, 5)
    samples = fields[np.asarray(pts), :]         # (r, 5)
    rec = deim_reconstruct(jnp.asarray(u), proj, jnp.asarray(samples))
    np.testing.assert_allclose(np.asarray(rec), fields, atol=1e-10)


def test_near_span_bounded_error(rng):
    u = _pod_modes(rng)
    pts, proj = deim_points(jnp.asarray(u))
    field = u @ rng.standard_normal(6) + 1e-3 * rng.standard_normal(400)
    rec = np.asarray(deim_reconstruct(
        jnp.asarray(u), proj, jnp.asarray(field[np.asarray(pts)])
    ))
    # error bounded by ||inv(U_P)|| * projection error (here ~1e-3 scale)
    amp = np.linalg.norm(np.asarray(proj), 2)
    assert np.abs(rec - field).max() < 10 * amp * 1e-3


def test_points_are_distinct(rng):
    u = _pod_modes(rng, r=8)
    pts, _ = deim_points(jnp.asarray(u))
    assert len(set(np.asarray(pts).tolist())) == 8
