"""Sketch-and-precondition least squares (Blendenpik/LSRN recipe).

EXTENSION tests — the reference solves LS via dense QR/pinv; these pin
the randomized solver: numpy-lstsq parity on well- AND ill-conditioned
tall systems, conditioning-independent convergence, multi-RHS, and the
residual-optimality (normal equations) certificate.
"""
import numpy as np
import pytest

from corrla_rs_tpu import sketched_lstsq


def _tall(rng, m=2000, n=40, cond=1e8):
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), n)
    return (u * s) @ v.T


def test_matches_numpy_lstsq_well_conditioned(rng):
    a = _tall(rng, cond=10)
    x_true = rng.standard_normal(40)
    b = a @ x_true + 0.01 * rng.standard_normal(2000)
    x, hist = sketched_lstsq(a, b, key=1)
    x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)
    assert hist[-1] < 1e-10 * hist[0]  # converged


def test_conditioning_independent_convergence(rng):
    # cond(A) = 1e8 would stall plain CGLS; the sketch preconditioner
    # makes the iteration count independent of cond(A)
    a = _tall(rng, cond=1e8)
    b = rng.standard_normal(2000)
    # 120 iterations ALSO exercises the best-iterate guard: plain CGLS
    # diverges in finite precision once past the attainable accuracy
    x, hist = sketched_lstsq(a, b, n_iters=120, key=2)
    x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)
    # compare through the residual (x itself is ill-determined along
    # the small singular directions at this conditioning)
    r_got = np.linalg.norm(a @ np.asarray(x) - b)
    r_ref = np.linalg.norm(a @ x_ref - b)
    assert r_got <= r_ref * (1 + 1e-10)
    # normal-equation residual ~ 0 RELATIVE to the problem scale
    # (x carries ~cond(A) ~ 1e8 magnitudes, so absolute thresholds
    # are meaningless here)
    ne = np.linalg.norm(a.T @ (a @ np.asarray(x) - b))
    assert ne < 1e-10 * np.linalg.norm(np.asarray(x))


def test_multiple_rhs(rng):
    a = _tall(rng, m=1200, n=24, cond=1e4)
    b = rng.standard_normal((1200, 3))
    x, hist = sketched_lstsq(a, b, key=3)
    assert x.shape == (24, 3) and hist.shape[0] == 3
    x_ref, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-4)
    # each column is residual-optimal
    for k in range(3):
        r_got = np.linalg.norm(a @ np.asarray(x)[:, k] - b[:, k])
        r_ref = np.linalg.norm(a @ x_ref[:, k] - b[:, k])
        assert r_got <= r_ref * (1 + 1e-9)


def test_validation(rng):
    a = _tall(rng, m=100, n=30)
    with pytest.raises(ValueError, match="tall"):
        sketched_lstsq(a.T, np.zeros(30))
    with pytest.raises(ValueError, match="sketch_factor"):
        sketched_lstsq(a, np.zeros(100), sketch_factor=1.0)
    with pytest.raises(ValueError, match="rows"):
        sketched_lstsq(a, np.zeros(99))


def test_sharded_same_answer(rng):
    # rows of A shard over the 8-device mesh; the m-contractions (the
    # sketch, A^T r) psum under GSPMD -> same solution
    from corrla_rs_tpu.parallel.mesh import make_mesh

    a = _tall(rng, m=1600, n=24, cond=1e4)
    b = rng.standard_normal(1600)
    x_single, _ = sketched_lstsq(a, b, key=7)
    x_shard, _ = sketched_lstsq(a, b, key=7, mesh=make_mesh(8))
    # x differs only by reduction-order rounding amplified by cond(A);
    # compare loosely in x and tightly through the residual
    np.testing.assert_allclose(np.asarray(x_shard),
                               np.asarray(x_single), rtol=1e-4)
    r_sh = np.linalg.norm(a @ np.asarray(x_shard) - b)
    r_si = np.linalg.norm(a @ np.asarray(x_single) - b)
    assert abs(r_sh - r_si) < 1e-10 * r_si
