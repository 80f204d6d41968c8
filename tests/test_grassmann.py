"""Grassmann basis interpolation (ops/grassmann) — extension tests.

Oracles: log/exp inversion on the manifold (projector round-trip);
rotation invariance of the log map (a basis is a subspace
representative); an analytically rotating subspace family where the
Grassmann interpolant must land near the true subspace while naive
entry-wise basis interpolation (+ QR) must not.
"""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.grassmann import (GrassmannInterp, grassmann_distance,
                                         grassmann_exp, grassmann_log,
                                         subspace_angles)


def _proj(y):
    y = np.asarray(y)
    return y @ y.T


def _rot_basis(theta, n=40, r=3):
    """Subspace family: first r coordinate axes rotated by theta in the
    (0, r)-plane, (1, r+1)-plane, ... — analytic geodesic on G(n, r)."""
    y = np.zeros((n, r))
    for j in range(r):
        y[j, j] = np.cos((j + 1) * theta)
        y[r + j, j] = np.sin((j + 1) * theta)
    return y


def test_log_exp_round_trip(rng):
    q0, _ = np.linalg.qr(rng.standard_normal((50, 5)))
    q1, _ = np.linalg.qr(rng.standard_normal((50, 5)))
    gam = grassmann_log(jnp.asarray(q0), jnp.asarray(q1))
    y = grassmann_exp(jnp.asarray(q0), gam)
    np.testing.assert_allclose(_proj(y), _proj(q1), atol=1e-9)
    # log at the base point is zero
    gam0 = grassmann_log(jnp.asarray(q0), jnp.asarray(q0))
    np.testing.assert_allclose(np.asarray(gam0), 0.0, atol=1e-9)


def test_log_is_rotation_invariant(rng):
    q0, _ = np.linalg.qr(rng.standard_normal((30, 4)))
    q1, _ = np.linalg.qr(rng.standard_normal((30, 4)))
    rot, _ = np.linalg.qr(rng.standard_normal((4, 4)))
    g1 = grassmann_log(jnp.asarray(q0), jnp.asarray(q1))
    g2 = grassmann_log(jnp.asarray(q0), jnp.asarray(q1 @ rot))
    # same subspace -> same exp target (tangent vectors may differ by
    # the SVD's internal rotation, the projector after exp must agree)
    y1 = grassmann_exp(jnp.asarray(q0), g1)
    y2 = grassmann_exp(jnp.asarray(q0), g2)
    np.testing.assert_allclose(_proj(y1), _proj(y2), atol=1e-9)


def test_angles_and_distance(rng):
    th = 0.3
    y0 = _rot_basis(0.0)
    y1 = _rot_basis(th)
    ang = np.asarray(subspace_angles(jnp.asarray(y0), jnp.asarray(y1)))
    np.testing.assert_allclose(np.sort(ang), np.sort([th, 2 * th, 3 * th]),
                               atol=1e-9)
    d = float(grassmann_distance(jnp.asarray(y0), jnp.asarray(y1)))
    np.testing.assert_allclose(d, np.linalg.norm([th, 2 * th, 3 * th]),
                               atol=1e-9)


def test_exact_at_anchors(rng):
    thetas = np.array([0.0, 0.15, 0.3, 0.45])
    bases = np.stack([_rot_basis(t) for t in thetas])
    gi = GrassmannInterp(bases, thetas[:, None], ref=1)
    for t, b in zip(thetas, bases):
        y = gi(np.array([t]))
        np.testing.assert_allclose(_proj(y), _proj(b), atol=1e-7)


def test_beats_naive_interpolation(rng):
    thetas = np.array([0.0, 0.2, 0.4, 0.6])
    # randomly right-rotate each anchor: subspaces unchanged, but naive
    # entry-wise interpolation of representatives is now garbage
    rots = [np.linalg.qr(rng.standard_normal((3, 3)))[0] for _ in thetas]
    bases = np.stack([_rot_basis(t) @ rot for t, rot in zip(thetas, rots)])
    t_query = 0.3
    truth = _rot_basis(t_query)

    gi = GrassmannInterp(bases, thetas[:, None], ref=1)
    y = gi(np.array([t_query]))
    err_g = float(grassmann_distance(jnp.asarray(truth), y))

    w = np.interp(t_query, thetas, np.arange(len(thetas)))
    lo, hi = int(np.floor(w)), int(np.ceil(w))
    naive = bases[lo] + (w - lo) * (bases[hi] - bases[lo])
    qn, _ = np.linalg.qr(naive)
    err_n = float(grassmann_distance(jnp.asarray(truth), jnp.asarray(qn)))

    assert err_g < 0.02, err_g
    assert err_g < 0.2 * err_n, (err_g, err_n)


def test_multi_query_and_orthonormal(rng):
    thetas = np.linspace(0, 0.5, 5)
    bases = np.stack([_rot_basis(t) for t in thetas])
    gi = GrassmannInterp(bases, thetas[:, None], ref=2)
    ys = gi(np.array([[0.1], [0.33]]))
    assert ys.shape == (2, 40, 3)
    for y in np.asarray(ys):
        np.testing.assert_allclose(y.T @ y, np.eye(3), atol=1e-8)


def test_2d_parameter_space(rng):
    # subspace depending smoothly on two parameters
    def basis(a, b):
        return _rot_basis(0.2 * a + 0.1 * b)

    pts = np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.], [0.5, 0.5]])
    bases = np.stack([basis(*p) for p in pts])
    gi = GrassmannInterp(bases, pts, ref=4)
    y = gi(np.array([0.5, 0.25]))
    truth = basis(0.5, 0.25)
    assert float(grassmann_distance(jnp.asarray(truth), y)) < 0.02
