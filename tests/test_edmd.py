"""EDMD / Koopman (models/edmd) against systems with known Koopman
structure."""
import numpy as np
import pytest

from corrla_rs_tpu.models.edmd import Edmd, poly_exponents


MU, LAM, C = 0.9, 0.5, 0.4


def _koopman_example(x0, m):
    """x1' = mu x1;  x2' = lam x2 + c x1^2 — the canonical system whose
    Koopman-invariant subspace is span{1, x1, x2, x1^2} with exact
    eigenvalues {1, mu, lam, mu^2} (Brunton et al. 2016 / Williams
    2015)."""
    xs = [np.asarray(x0, float)]
    for _ in range(m):
        x1, x2 = xs[-1]
        xs.append(np.array([MU * x1, LAM * x2 + C * x1 * x1]))
    return np.stack(xs, axis=1)


def test_linear_dictionary_reduces_to_dmd(rng):
    n, m = 5, 200
    a = rng.standard_normal((n, n))
    a *= 0.9 / np.max(np.abs(np.linalg.eigvals(a)))
    # random snapshot pairs keep the Gram well conditioned (autonomous
    # decaying trajectories would square its condition number)
    x = rng.standard_normal((n, m))
    ed = Edmd(x, dictionary="linear", include_const=False, y_data=a @ x)
    np.testing.assert_allclose(np.asarray(ed.koopman), a, atol=1e-8)
    np.testing.assert_allclose(
        np.sort_complex(ed.lambdas),
        np.sort_complex(np.linalg.eigvals(a)), atol=1e-8,
    )


def test_poly_dictionary_recovers_koopman_spectrum(rng):
    # several initial conditions give a persistently exciting data set
    blocks_x, blocks_y = [], []
    for _ in range(8):
        traj = _koopman_example(rng.uniform(-1, 1, 2), 30)
        blocks_x.append(traj[:, :-1])
        blocks_y.append(traj[:, 1:])
    x = np.hstack(blocks_x)
    y = np.hstack(blocks_y)
    ed = Edmd(x, dictionary="poly", degree=2, y_data=y)
    # {1, mu, lam, mu^2} must appear in the spectrum to fp accuracy
    lam = ed.lambdas
    for target in (1.0, MU, LAM, MU * MU):
        assert np.min(np.abs(lam - target)) < 1e-7, target


def test_lifted_prediction_exact_on_invariant_subspace(rng):
    blocks = [_koopman_example(rng.uniform(-1, 1, 2), 30) for _ in range(8)]
    x = np.hstack([b[:, :-1] for b in blocks])
    y = np.hstack([b[:, 1:] for b in blocks])
    ed = Edmd(x, degree=2, y_data=y)
    x0 = np.array([0.7, -0.3])
    truth = _koopman_example(x0, 15)[:, 1:]
    pred = np.asarray(ed.predict(x0, 15))
    np.testing.assert_allclose(pred, truth, atol=1e-7)
    pred_rl = np.asarray(ed.predict(x0, 15, relift=True))
    np.testing.assert_allclose(pred_rl, truth, atol=1e-7)


def test_eigenfunctions_satisfy_composition(rng):
    blocks = [_koopman_example(rng.uniform(-1, 1, 2), 30) for _ in range(8)]
    x = np.hstack([b[:, :-1] for b in blocks])
    y = np.hstack([b[:, 1:] for b in blocks])
    ed = Edmd(x, degree=2, y_data=y)
    # phi(F(x)) = lambda phi(x) on fresh points, for the exact eigpairs
    pts = rng.uniform(-1, 1, (2, 40))
    nxt = np.stack([MU * pts[0], LAM * pts[1] + C * pts[0] ** 2])
    phi_x = ed.eigenfunctions(pts)
    phi_y = ed.eigenfunctions(nxt)
    for target in (MU, LAM, MU * MU):
        j = int(np.argmin(np.abs(ed.lambdas - target)))
        resid = phi_y[j] - ed.lambdas[j] * phi_x[j]
        scale = max(np.max(np.abs(phi_x[j])), 1e-12)
        assert np.max(np.abs(resid)) / scale < 1e-6, target


def test_rbf_dictionary_forecasts_nonpoly_system(rng):
    # x' = 0.95 sin(x) on [0.2, 2.5]: not polynomial; RBF dictionary
    # should forecast much better than the linear model
    def step(v):
        return 0.95 * np.sin(v)

    trajs = []
    for x0 in np.linspace(0.2, 2.5, 12):
        xs = [np.array([x0])]
        for _ in range(25):
            xs.append(step(xs[-1]))
        trajs.append(np.stack(xs, axis=1))
    x = np.hstack([t[:, :-1] for t in trajs])
    y = np.hstack([t[:, 1:] for t in trajs])
    centers = np.linspace(0.0, 2.7, 14)[:, None]
    ed = Edmd(x, dictionary="rbf", centers=centers, gamma=4.0, y_data=y)
    lin = Edmd(x, dictionary="linear", y_data=y)
    x0 = np.array([1.7])
    truth = [step(x0)]
    for _ in range(9):
        truth.append(step(truth[-1]))
    truth = np.stack(truth, axis=1)
    err_rbf = np.max(np.abs(np.asarray(ed.predict(x0, 10, relift=True)) - truth))
    err_lin = np.max(np.abs(np.asarray(lin.predict(x0, 10, relift=True)) - truth))
    assert err_rbf < 1e-3
    assert err_rbf < err_lin / 10


def test_custom_dictionary_and_trajectory_pairing(rng):
    traj = _koopman_example([0.8, -0.5], 60)
    ed = Edmd(traj, dictionary=lambda x: x[0:1] ** 2)  # pairs from columns
    x0 = np.array([0.6, 0.2])
    truth = _koopman_example(x0, 8)[:, 1:]
    np.testing.assert_allclose(
        np.asarray(ed.predict(x0, 8)), truth, atol=1e-6
    )


def test_checkpoint_roundtrip(rng, tmp_path):
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    blocks = [_koopman_example(rng.uniform(-1, 1, 2), 20) for _ in range(4)]
    x = np.hstack([b[:, :-1] for b in blocks])
    y = np.hstack([b[:, 1:] for b in blocks])
    ed = Edmd(x, degree=2, y_data=y)
    path = str(tmp_path / "edmd.npz")
    save_model(path, ed)
    ed2 = load_model(path)
    np.testing.assert_allclose(
        np.asarray(ed2.koopman), np.asarray(ed.koopman)
    )
    np.testing.assert_allclose(ed2.lambdas, ed.lambdas)
    x0 = np.array([0.4, 0.1])
    np.testing.assert_allclose(
        np.asarray(ed2.predict(x0, 5)), np.asarray(ed.predict(x0, 5))
    )
    pts = rng.uniform(-1, 1, (2, 7))
    np.testing.assert_allclose(
        ed2.eigenfunctions(pts), ed.eigenfunctions(pts)
    )


def test_poly_exponents_enumeration():
    e = poly_exponents(2, 2)
    assert sorted(map(tuple, e.tolist())) == [(0, 2), (1, 1), (2, 0)]
    assert poly_exponents(3, 1).shape == (0, 3)
    # degree 3 in 2 vars: x^2, xy, y^2, x^3, x^2 y, x y^2, y^3
    assert poly_exponents(2, 3).shape == (7, 2)


def test_validation(rng):
    x = rng.standard_normal((3, 10))
    with pytest.raises(ValueError, match="dictionary"):
        Edmd(x, dictionary="fourier")
    with pytest.raises(ValueError, match="centers"):
        Edmd(x, dictionary="rbf")
    with pytest.raises(ValueError, match="centers must be"):
        Edmd(x, dictionary="rbf", centers=np.zeros((4, 2)))
    with pytest.raises(ValueError, match="x_data"):
        Edmd(x[:, :1])
    with pytest.raises(ValueError, match="y_data"):
        Edmd(x, y_data=x[:, :5])
    ed = Edmd(x)
    with pytest.raises(ValueError, match="entries"):
        ed.predict(np.zeros(4), 3)
    with pytest.raises(ValueError, match="rows"):
        ed.lift(rng.standard_normal((5, 2)))


def test_resdmd_residuals_small_on_invariant_subspace(rng):
    # degree-2 poly dictionary on the canonical example: the Koopman-
    # invariant subspace is fully represented, so EVERY eigenpair that
    # carries data energy has ~zero residual
    xs = [
        _koopman_example(rng.uniform(-1, 1, 2), 30) for _ in range(8)
    ]
    x = np.concatenate([s[:, :-1] for s in xs], axis=1)
    y = np.concatenate([s[:, 1:] for s in xs], axis=1)
    ed = Edmd(x, dictionary="poly", degree=2, y_data=y)
    res = ed.residuals()
    assert res.shape == (ed.n_features,)
    # the invariant eigenpairs {1, mu, lam, mu^2} have ~zero residual;
    # the two non-invariant dictionary directions (x1 x2 and x2^2 feed
    # x1^3, x1^2 x2 outside the dictionary) are correctly flagged
    for lt in (1.0, MU, LAM, MU ** 2):
        j = int(np.argmin(np.abs(ed.lambdas - lt)))
        assert res[j] < 1e-6
    lams, res_keep = ed.validated_spectrum(1e-6)
    assert lams.size == 4 and np.all(res_keep < 1e-6)
    assert np.max(res) > 0.05  # pollution visible


def test_resdmd_residuals_match_direct_computation(rng):
    # guard the Gram algebra: recompute the residual definition
    # directly from lifted snapshots
    xs = _koopman_example(rng.uniform(-1, 1, 2), 60)
    x = xs[:, :-1] + 0.01 * rng.standard_normal((2, 60))
    y = xs[:, 1:] + 0.01 * rng.standard_normal((2, 60))
    ed = Edmd(x, dictionary="poly", degree=3, y_data=y)
    res = ed.residuals()
    psi_x = np.asarray(ed.lift(np.asarray(x)))
    psi_y = np.asarray(ed.lift(np.asarray(y)))
    for j in range(ed.n_features):
        u = ed._w[j, :]
        rx = u @ psi_x
        ry = u @ psi_y
        num = np.mean(np.abs(ry - ed.lambdas[j] * rx) ** 2)
        den = np.mean(np.abs(rx) ** 2)
        # atol floor: the Gram route squares before subtracting, so
        # near-zero residuals carry ~sqrt(eps) cancellation noise
        np.testing.assert_allclose(res[j], np.sqrt(num / den),
                                   rtol=1e-5, atol=5e-7)


def test_resdmd_flags_spectral_pollution(rng):
    # a degree-3 dictionary on NOISY data from the 2-d example: the 4
    # true eigenvalues keep small residuals, while x2^2/x2^3-type
    # observables map onto x1^4... OUTSIDE the dictionary -> their
    # Galerkin eigenvalues are structurally polluted (large residual
    # regardless of the noise draw); validated_spectrum keeps the
    # physical set
    xs = [
        _koopman_example(rng.uniform(-1, 1, 2), 40) for _ in range(10)
    ]
    x = np.concatenate([s[:, :-1] for s in xs], axis=1)
    y = np.concatenate([s[:, 1:] for s in xs], axis=1)
    x += 0.002 * rng.standard_normal(x.shape)
    y += 0.002 * rng.standard_normal(y.shape)
    ed = Edmd(x, dictionary="poly", degree=3, y_data=y)
    res = ed.residuals()
    lam_true = np.array([1.0, MU, LAM, MU ** 2])
    # residual at the nearest eigenvalue to each true one is small...
    for lt in lam_true:
        j = int(np.argmin(np.abs(ed.lambdas - lt)))
        assert res[j] < 0.05
    # ...and the dictionary's worst eigenpairs are visibly polluted
    assert np.max(res) > 0.05
    lams, _ = ed.validated_spectrum(0.05)
    for lt in lam_true:
        assert np.min(np.abs(lams - lt)) < 0.05
    assert lams.size < ed.n_features
