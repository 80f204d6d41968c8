"""Online DMD/DMDc (models/online_dmd) vs batch least squares and
simulated LTI ground truth."""
import numpy as np
import pytest

from corrla_rs_tpu.models.online_dmd import OnlineDmd


def _stable_system(rng, n, q):
    """Random discrete-time LTI (A spectral radius ~0.95, B)."""
    a = rng.standard_normal((n, n))
    a *= 0.95 / np.max(np.abs(np.linalg.eigvals(a)))
    b = rng.standard_normal((n, q)) if q else np.zeros((n, 0))
    return a, b


def _simulate(a, b, x0, u, m):
    xs = [x0]
    for k in range(m):
        xs.append(a @ xs[-1] + (b @ u[:, k] if b.shape[1] else 0.0))
    return np.stack(xs, axis=1)  # (n, m+1)


def test_matches_batch_ridge_solution(rng):
    # forgetting=1: streaming estimate == Y Z^T (Z Z^T + ridge I)^{-1}
    n, q, m = 6, 2, 80
    a, b = _stable_system(rng, n, q)
    u = rng.standard_normal((q, m))
    x = _simulate(a, b, rng.standard_normal(n), u, m)
    x += 0.01 * rng.standard_normal(x.shape)   # noise -> LS is nontrivial
    ridge = 1e-3
    od = OnlineDmd(n, q, ridge=ridge)
    for lo in range(0, m, 17):                 # uneven batches incl. tail
        hi = min(lo + 17, m)
        od.update(x[:, lo:hi], x[:, lo + 1:hi + 1], u[:, lo:hi])
    assert od.n_seen == m
    z = np.vstack([x[:, :m], u])
    ab_batch = x[:, 1:] @ z.T @ np.linalg.inv(z @ z.T + ridge * np.eye(n + q))
    np.testing.assert_allclose(
        np.asarray(od._ab), ab_batch, rtol=1e-8, atol=1e-10
    )


def test_recovers_lti_and_predicts(rng):
    n, q, m = 8, 2, 200
    a, b = _stable_system(rng, n, q)
    u = rng.standard_normal((q, m))
    x = _simulate(a, b, rng.standard_normal(n), u, m)
    od = OnlineDmd(n, q).fit_stream(x, u, batch=64)
    np.testing.assert_allclose(np.asarray(od.a), a, atol=1e-6)
    np.testing.assert_allclose(np.asarray(od.b), b, atol=1e-6)
    # spectrum
    lam, w = od.eig()
    lam_true = np.linalg.eigvals(a)
    np.testing.assert_allclose(
        np.sort_complex(lam), np.sort_complex(lam_true), atol=1e-6
    )
    res = a @ w - w * lam[None, :]
    assert np.max(np.abs(res)) < 1e-6
    # rollout matches the simulator
    u_new = rng.standard_normal((q, 10))
    x0 = rng.standard_normal(n)
    pred = np.asarray(od.predict(x0, u_new))
    truth = _simulate(a, b, x0, u_new, 10)[:, 1:]
    np.testing.assert_allclose(pred, truth, atol=1e-5)


def test_plain_online_dmd_no_control(rng):
    n, m = 5, 120
    a, _ = _stable_system(rng, n, 0)
    x = _simulate(a, np.zeros((n, 0)), rng.standard_normal(n), None, m)
    od = OnlineDmd(n).fit_stream(x, batch=50)
    # the autonomous trajectory decays (0.95^120 ~ 2e-3) so the Gram is
    # mildly ill-conditioned; ~6-digit recovery is the f64 expectation
    np.testing.assert_allclose(np.asarray(od.a), a, atol=3e-5)
    assert od.b.shape == (n, 0)
    pred = np.asarray(od.predict(x[:, 0], n_steps=5))
    np.testing.assert_allclose(pred, x[:, 1:6], atol=1e-5)


def test_forgetting_tracks_switched_dynamics(rng):
    # dynamics switch halfway; rho<1 must converge to the new operator,
    # rho=1 stays stuck between the two. A driven system keeps the
    # states persistently excited (an autonomous stable one decays to
    # nothing and starves the estimator).
    n, q, m = 4, 2, 400
    a1, b = _stable_system(rng, n, q)
    a2 = rng.standard_normal((n, n))
    a2 *= 0.95 / np.max(np.abs(np.linalg.eigvals(a2)))
    u1 = rng.standard_normal((q, m))
    u2 = rng.standard_normal((q, m))
    x0 = rng.standard_normal(n)
    seg1 = _simulate(a1, b, x0, u1, m)
    seg2 = _simulate(a2, b, seg1[:, -1], u2, m)

    def drive(rho):
        od = OnlineDmd(n, q, forgetting=rho)
        od.fit_stream(seg1, u1, batch=40)
        od.fit_stream(seg2, u2, batch=40)
        return float(np.max(np.abs(np.asarray(od.a) - a2)))

    err_forget = drive(0.9)
    err_flat = drive(1.0)
    assert err_forget < 1e-6
    assert err_flat > 100 * err_forget


@pytest.mark.slow
def test_forgetting_is_batch_size_invariant(rng):
    # rho weights snapshot PAIRS, so chunking must not change the result
    n, q, m = 3, 1, 60
    a, b = _stable_system(rng, n, q)
    u = rng.standard_normal((q, m))
    x = _simulate(a, b, rng.standard_normal(n), u, m)
    x += 0.05 * rng.standard_normal(x.shape)
    est = []
    for batch in (1, 7, 30):
        od = OnlineDmd(n, q, forgetting=0.93, ridge=1e-4)
        od.fit_stream(x, u, batch=batch)
        est.append(np.asarray(od._ab))
    # invariance is exact in exact arithmetic; fp rounding differs per
    # grouping (P scales by rho^-m ~ 78 over the stream) — atol 1e-9
    np.testing.assert_allclose(est[0], est[1], rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(est[0], est[2], rtol=1e-7, atol=1e-9)


def test_checkpoint_roundtrip(rng, tmp_path):
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    n, q, m = 4, 1, 60
    a, b = _stable_system(rng, n, q)
    u = rng.standard_normal((q, m))
    x = _simulate(a, b, rng.standard_normal(n), u, m)
    od = OnlineDmd(n, q).fit_stream(x, u)
    path = str(tmp_path / "odmd.npz")
    save_model(path, od)
    od2 = load_model(path)
    np.testing.assert_allclose(np.asarray(od2._ab), np.asarray(od._ab))
    np.testing.assert_allclose(np.asarray(od2._p), np.asarray(od._p))
    assert od2.n_seen == od.n_seen and od2.forgetting == od.forgetting
    # resumed stream continues identically
    od.update(x[:, :3], x[:, 1:4], u[:, :3])
    od2.update(x[:, :3], x[:, 1:4], u[:, :3])
    np.testing.assert_allclose(np.asarray(od2._ab), np.asarray(od._ab))


def test_validation():
    with pytest.raises(ValueError, match="n_state"):
        OnlineDmd(0)
    with pytest.raises(ValueError, match="forgetting"):
        OnlineDmd(3, forgetting=0.0)
    with pytest.raises(ValueError, match="ridge"):
        OnlineDmd(3, ridge=-1.0)
    od = OnlineDmd(3, 1)
    with pytest.raises(ValueError, match="requires control"):
        od.update(np.zeros((3, 2)), np.zeros((3, 2)))
    with pytest.raises(ValueError, match="columns"):
        od.update(np.zeros((3, 2)), np.zeros((3, 3)), np.zeros((1, 2)))
    with pytest.raises(ValueError, match="n_ctrl=0"):
        OnlineDmd(3).update(np.zeros((3, 2)), np.zeros((3, 2)),
                            np.zeros((1, 2)))
    with pytest.raises(ValueError, match="must be"):
        od.update(np.zeros((4, 2)), np.zeros((3, 2)), np.zeros((1, 2)))
    with pytest.raises(ValueError, match="n_steps"):
        OnlineDmd(3).predict(np.zeros(3))
