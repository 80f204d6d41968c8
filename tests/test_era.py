"""Eigensystem Realization Algorithm (Juang-Pappa).

EXTENSION tests — the reference's only control-aware ROM (DMDc) needs
full-state snapshots; ERA identifies a balanced minimal realization
from input-output impulse data. Oracles: exact pole/Markov recovery on
a known LTI system and response parity with scipy.signal.dlsim.
"""
import numpy as np
import pytest

from corrla_rs_tpu import Era, era
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def _siso_system():
    """Stable 3-state SISO system with known poles."""
    a = np.array([[0.9, 0.2, 0.0],
                  [0.0, 0.7, 0.3],
                  [0.0, 0.0, 0.5]])
    b = np.array([[1.0], [0.5], [-0.3]])
    c = np.array([[1.0, -0.4, 0.2]])
    return a, b, c


def _markov(a, b, c, n):
    hs = np.empty((n, c.shape[0], b.shape[1]))
    ca = c.copy()
    for k in range(n):
        hs[k] = ca @ b
        ca = ca @ a
    return hs


def test_era_recovers_siso_system():
    a, b, c = _siso_system()
    h = _markov(a, b, c, 40)
    fit = era(h, rank=3)
    # poles recovered exactly
    np.testing.assert_allclose(np.sort(fit.lambdas.real),
                               [0.5, 0.7, 0.9], atol=1e-9)
    assert np.max(np.abs(fit.lambdas.imag)) < 1e-10
    # held-out Markov parameters reproduced
    h_fit = np.asarray(fit.impulse_response(60))
    h_true = _markov(a, b, c, 60)
    np.testing.assert_allclose(h_fit, h_true, atol=1e-9)
    # Hankel singular values: exactly 3 nonzero at f64 scale
    hsv = np.asarray(fit.hsv)
    assert hsv[2] > 1e-3
    assert np.all(np.diff(hsv) <= 1e-12)


def test_era_mimo_and_dlsim_parity(rng):
    # random stable 4-state, 2-in 3-out system
    q, _ = np.linalg.qr(rng.standard_normal((4, 4)))
    a = q @ np.diag([0.85, 0.6, -0.4, 0.3]) @ q.T
    b = rng.standard_normal((4, 2))
    c = rng.standard_normal((3, 4))
    h = _markov(a, b, c, 30)
    fit = era(h, rank=4)
    np.testing.assert_allclose(
        np.sort_complex(fit.lambdas), np.sort([0.85, 0.6, -0.4, 0.3]),
        atol=1e-8)
    # forced-response parity with scipy.signal.dlsim
    from scipy import signal

    u = rng.standard_normal((2, 50))
    y = np.asarray(fit.predict(u))
    _, y_ref, _ = signal.dlsim(
        (a, b, c, np.zeros((3, 2)), 1.0), u.T)
    np.testing.assert_allclose(y, y_ref.T, atol=1e-8)


def test_era_truncation_via_hsv(rng):
    # 5-state system with two dominant Hankel directions: the rank-2
    # realization matches the full response to the hsv[2] scale
    a = np.diag([0.9, 0.8, 0.05, 0.03, 0.01])
    b = np.array([[1.0], [1.0], [0.01], [0.01], [0.01]])
    c = np.array([[1.0, 1.0, 0.01, 0.01, 0.01]])
    h = _markov(a, b, c, 40)
    full = era(h, rank=5)
    red = era(h, rank=2)
    hsv = np.asarray(full.hsv)
    assert hsv[1] / hsv[2] > 100  # clear gap
    h_red = np.asarray(red.impulse_response(40))
    np.testing.assert_allclose(h_red, h, atol=10 * float(hsv[2]))


def test_era_validation_and_checkpoint(tmp_path):
    a, b, c = _siso_system()
    h = _markov(a, b, c, 20)
    with pytest.raises(ValueError, match="rank"):
        era(h, rank=0)
    with pytest.raises(ValueError, match="mo"):
        era(h, rank=2, mo=25)
    with pytest.raises(ValueError, match="markov"):
        era(np.zeros((3, 2, 2, 2)), rank=1)
    fit = era(h, rank=3)
    with pytest.raises(ValueError, match="u_seq"):
        fit.predict(np.zeros((4, 10)))
    with pytest.raises(ValueError, match="x0"):
        fit.predict(np.zeros((1, 10)), x0=np.zeros(7))
    p = str(tmp_path / "era.npz")
    save_model(p, fit)
    fit2 = load_model(p)
    assert isinstance(fit2, Era) and fit2.order == 3
    u = np.ones((1, 12))
    np.testing.assert_allclose(np.asarray(fit2.predict(u)),
                               np.asarray(fit.predict(u)), atol=1e-12)


def _simulate(a, b, c, d, u, x0=None):
    n = u.shape[1]
    x = np.zeros(a.shape[0]) if x0 is None else np.asarray(x0, float)
    ys = np.empty((c.shape[0], n))
    for t in range(n):
        ys[:, t] = c @ x + d @ u[:, t]
        x = a @ x + b @ u[:, t]
    return ys


def test_okid_recovers_markov_parameters(rng):
    a, b, c = _siso_system()
    d = np.array([[0.7]])
    u = rng.standard_normal((1, 600))
    y = _simulate(a, b, c, d, u)
    from corrla_rs_tpu import okid

    markov, d_est = okid(u, y, n_markov=25, n_obs=12)
    np.testing.assert_allclose(d_est, d, atol=1e-8)
    np.testing.assert_allclose(markov, _markov(a, b, c, 25), atol=1e-7)


def test_era_okid_end_to_end(rng):
    # operating data (random input, nonzero feedthrough) -> realization
    from corrla_rs_tpu import era_okid

    a, b, c = _siso_system()
    d = np.array([[0.3]])
    u = rng.standard_normal((1, 800))
    y = _simulate(a, b, c, d, u)
    fit = era_okid(u, y, rank=3, n_markov=30, n_obs=15)
    np.testing.assert_allclose(np.sort(fit.lambdas.real),
                               [0.5, 0.7, 0.9], atol=1e-6)
    # held-out input reproduces the response INCLUDING the feedthrough
    u2 = rng.standard_normal((1, 60))
    y2 = np.asarray(fit.predict(u2))
    np.testing.assert_allclose(y2, _simulate(a, b, c, d, u2), atol=1e-6)


def test_okid_mimo_noisy(rng):
    q, _ = np.linalg.qr(rng.standard_normal((4, 4)))
    a = q @ np.diag([0.8, 0.55, -0.35, 0.2]) @ q.T
    b = rng.standard_normal((4, 2))
    c = rng.standard_normal((2, 4))
    d = np.zeros((2, 2))
    u = rng.standard_normal((2, 3000))
    y = _simulate(a, b, c, d, u)
    y += 1e-4 * rng.standard_normal(y.shape)
    from corrla_rs_tpu import era_okid

    fit = era_okid(u, y, rank=4, n_markov=30, n_obs=10)
    np.testing.assert_allclose(
        np.sort_complex(fit.lambdas),
        np.sort([0.8, 0.55, -0.35, 0.2]), atol=5e-3)


def test_okid_validation(rng):
    from corrla_rs_tpu import okid

    u = rng.standard_normal((1, 50))
    y = rng.standard_normal((1, 50))
    with pytest.raises(ValueError, match="equal N"):
        okid(u, y[:, :40], 5)
    with pytest.raises(ValueError, match="n_obs"):
        okid(u, y, 5, n_obs=0)
    with pytest.raises(ValueError, match="record too short"):
        okid(u, y, 20)


def test_balanced_truncation_error_bound(rng):
    # 5-state system; truncate the identified realization to order 2
    # and check the classic balanced-truncation H-infinity bound
    a = np.diag([0.9, 0.8, 0.3, 0.2, 0.1])
    b = np.array([[1.0], [0.8], [0.2], [0.1], [0.05]])
    c = np.array([[1.0, 0.9, 0.15, 0.1, 0.05]])
    # long Markov window: ERA balances FINITE-horizon Gramians, and
    # the infinite-horizon bound only holds once the window captures
    # the slowest pole's tail (0.9^120 ~ 3e-6)
    h = _markov(a, b, c, 240)
    full = era(h, rank=5)
    red = full.truncate(2)
    assert red.order == 2 and np.asarray(red.hsv).shape == (2,)
    # the classic bound is on the H-infinity norm of the ERROR SYSTEM:
    # sup_w |G(e^iw) - G_r(e^iw)| <= 2 sum hsv[r:]
    bound = 2.0 * float(np.sum(np.asarray(full.hsv)[2:]))

    def tf(aa, bb, cc, w):
        return np.array([
            (cc @ np.linalg.solve(np.exp(1j * wi) * np.eye(aa.shape[0])
                                  - aa, bb))[0, 0]
            for wi in w
        ])

    w = np.linspace(0, np.pi, 400)
    g_full = tf(a, b, c, w)
    g_red = tf(np.asarray(red.a), np.asarray(red.b),
               np.asarray(red.c), w)
    hinf_err = float(np.max(np.abs(g_full - g_red)))
    assert hinf_err < bound
    # dominant poles survive the truncation
    assert np.max(np.abs(red.lambdas.real)) > 0.85
    with pytest.raises(ValueError, match="order"):
        full.truncate(9)
