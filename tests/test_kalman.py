"""Steady-state Kalman filtering (ops/kalman).

EXTENSION tests — oracles: scipy.linalg.solve_discrete_are for the
Riccati solution; filtering beats open-loop rollout on noisy data;
innovations are white with the predicted covariance; the innovations
likelihood peaks at the true noise level.
"""
import numpy as np
import pytest

from corrla_rs_tpu import dare, kalman_filter, kalman_smooth


def _system():
    a = np.array([[0.9, 0.15], [0.0, 0.7]])
    b = np.array([[0.5], [1.0]])
    c = np.array([[1.0, 0.3]])
    d = np.array([[0.0]])
    return a, b, c, d


def _simulate(rng, a, b, c, d, u, q_sd, r_sd):
    n = a.shape[0]
    t_len = u.shape[1]
    x = np.zeros(n)
    xs = np.empty((n, t_len))
    ys = np.empty((c.shape[0], t_len))
    for t in range(t_len):
        xs[:, t] = x
        ys[:, t] = c @ x + d @ u[:, t] + r_sd * rng.standard_normal(
            c.shape[0])
        x = a @ x + b @ u[:, t] + q_sd * rng.standard_normal(n)
    return xs, ys


def test_dare_matches_scipy():
    from scipy.linalg import solve_discrete_are

    a, _, c, _ = _system()
    q = np.diag([0.04, 0.09])
    r = np.array([[0.25]])
    p = np.asarray(dare(a, c, q, r))
    p_ref = solve_discrete_are(a.T, c.T, q, r)
    np.testing.assert_allclose(p, p_ref, rtol=1e-10)


def test_filter_beats_open_loop_and_innovations_white(rng):
    a, b, c, d = _system()
    q_sd, r_sd = 0.2, 0.3
    u = rng.standard_normal((1, 4000))
    xs, ys = _simulate(rng, a, b, c, d, u, q_sd, r_sd)
    out = kalman_filter(a, b, c, d, q_sd**2, r_sd**2, u, ys)
    x_f = np.asarray(out["x_filt"])
    # open-loop rollout (no measurement feedback)
    x = np.zeros(2)
    x_ol = np.empty_like(xs)
    for t in range(u.shape[1]):
        x_ol[:, t] = x
        x = a @ x + b @ u[:, t]
    err_f = np.mean((x_f - xs) ** 2)
    err_ol = np.mean((x_ol - xs) ** 2)
    assert err_f < 0.5 * err_ol
    # innovations: white with covariance ~ C P C^T + R
    e = np.asarray(out["innovations"])[0]
    s_pred = float(np.asarray(out["innovation_cov"])[0, 0])
    assert np.var(e) == pytest.approx(s_pred, rel=0.1)
    lag1 = np.corrcoef(e[:-1], e[1:])[0, 1]
    assert abs(lag1) < 0.05


def test_rts_smoother_beats_filter(rng):
    a, b, c, d = _system()
    q_sd, r_sd = 0.2, 0.3
    u = rng.standard_normal((1, 4000))
    xs, ys = _simulate(rng, a, b, c, d, u, q_sd, r_sd)
    out = kalman_smooth(a, b, c, d, q_sd**2, r_sd**2, u, ys)
    err_f = np.mean((np.asarray(out["x_filt"]) - xs) ** 2)
    err_s = np.mean((np.asarray(out["x_smooth"]) - xs) ** 2)
    assert err_s < err_f          # whole-record estimates are better
    assert out["x_smooth"].shape == xs.shape
    # the filter's public dict stays clean (no private keys)
    flt = kalman_filter(a, b, c, d, q_sd**2, r_sd**2, u, ys)
    assert all(not key.startswith("_") for key in flt)


def test_loglik_peaks_at_true_noise(rng):
    a, b, c, d = _system()
    q_sd, r_sd = 0.15, 0.4
    u = rng.standard_normal((1, 3000))
    _, ys = _simulate(rng, a, b, c, d, u, q_sd, r_sd)
    lls = {}
    for scale in (0.25, 1.0, 4.0):
        out = kalman_filter(a, b, c, d, (scale * q_sd) ** 2,
                            (scale * r_sd) ** 2, u, ys)
        lls[scale] = out["loglik"]
    assert lls[1.0] > lls[0.25] and lls[1.0] > lls[4.0]


def test_kalman_validation(rng):
    a, b, c, d = _system()
    with pytest.raises(ValueError, match="shape mismatch"):
        dare(a, c, np.eye(3), np.eye(1))
    with pytest.raises(ValueError, match="u_seq/y_seq"):
        kalman_filter(a, b, c, d, 0.1, 0.1,
                      np.zeros((1, 10)), np.zeros((1, 9)))
    # d=None means zero feedthrough; scalar q/r broadcast
    u = rng.standard_normal((1, 50))
    _, ys = _simulate(rng, a, b, c, d, u, 0.1, 0.1)
    out = kalman_filter(a, b, c, None, 0.01, 0.01, u, ys)
    assert out["x_filt"].shape == (2, 50)
    assert np.isfinite(out["loglik"])


def test_transposed_b_d_rejected(rng):
    a, b, c, d = _system()
    u = rng.standard_normal((1, 30))
    y = rng.standard_normal((1, 30))
    with pytest.raises(ValueError, match="b must be"):
        kalman_filter(a, b.T.copy().reshape(1, 2), c, d, 0.1, 0.1, u, y)
    with pytest.raises(ValueError, match="d must be"):
        kalman_filter(a, b, c, np.zeros((2, 1)), 0.1, 0.1, u, y)


def test_dlqr_matches_scipy_and_stabilizes(rng):
    from scipy.linalg import solve_discrete_are

    from corrla_rs_tpu import dlqr

    # an UNSTABLE system the LQR must stabilize
    a = np.array([[1.1, 0.4], [0.0, 0.95]])
    b = np.array([[0.0], [1.0]])
    q = np.eye(2)
    r = np.array([[0.5]])
    k_gain, p = dlqr(a, b, q, r)
    p_ref = solve_discrete_are(a, b, q, r)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-10)
    k_ref = np.linalg.solve(b.T @ p_ref @ b + r, b.T @ p_ref @ a)
    np.testing.assert_allclose(np.asarray(k_gain), k_ref, rtol=1e-10)
    # closed loop is stable, open loop is not
    assert np.max(np.abs(np.linalg.eigvals(a))) > 1
    cl = a - b @ np.asarray(k_gain)
    assert np.max(np.abs(np.linalg.eigvals(cl))) < 1


def test_dlqr_scalar_costs_and_validation():
    from corrla_rs_tpu import dlqr

    a = np.array([[1.05, 0.3], [0.0, 0.9]])
    b = np.array([[0.0], [1.0]])
    k1, _ = dlqr(a, b, 1.0, 0.5)            # scalars broadcast
    k2, _ = dlqr(a, b, np.eye(2), np.array([[0.5]]))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2),
                               rtol=1e-12)
    with pytest.raises(ValueError, match="b must be"):
        dlqr(a, np.zeros((3, 1)), 1.0, 1.0)
    with pytest.raises(ValueError, match="q must be"):
        dlqr(a, b, np.eye(3), 1.0)
