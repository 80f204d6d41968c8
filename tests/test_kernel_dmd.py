"""Kernel DMD (models/kernel_dmd) against known Koopman structure."""
import numpy as np
import pytest

from corrla_rs_tpu.models.kernel_dmd import KernelDmd

MU, LAM, C = 0.9, 0.5, 0.4


def _koopman_example(x0, m):
    xs = [np.asarray(x0, float)]
    for _ in range(m):
        x1, x2 = xs[-1]
        xs.append(np.array([MU * x1, LAM * x2 + C * x1 * x1]))
    return np.stack(xs, axis=1)


def _example_data(rng, n_traj=8, m=30):
    blocks = [_koopman_example(rng.uniform(-1, 1, 2), m)
              for _ in range(n_traj)]
    x = np.hstack([b[:, :-1] for b in blocks])
    y = np.hstack([b[:, 1:] for b in blocks])
    return x, y


def test_linear_kernel_reduces_to_dmd(rng):
    n, m = 5, 120
    a = rng.standard_normal((n, n))
    a *= 0.9 / np.max(np.abs(np.linalg.eigvals(a)))
    x = rng.standard_normal((n, m))
    kd = KernelDmd(x, rank=n, kernel="linear", y_data=a @ x)
    np.testing.assert_allclose(
        np.sort_complex(kd.lambdas),
        np.sort_complex(np.linalg.eigvals(a)), atol=1e-8,
    )
    # prediction matches the linear system
    x0 = rng.standard_normal(n)
    truth = np.stack(
        [np.linalg.matrix_power(a, t) @ x0 for t in range(1, 6)], axis=1
    )
    np.testing.assert_allclose(
        kd.predict(x0, 5), truth, atol=1e-7
    )


def test_poly_kernel_exact_on_invariant_subspace(rng):
    # (x.z + 1)^2 spans all monomials to degree 2 -> the invariant
    # subspace {1, x1, x2, x1^2} is inside the RKHS: spectrum exact
    x, y = _example_data(rng)
    kd = KernelDmd(x, rank=6, kernel="poly", degree=2, y_data=y)
    for target in (1.0, MU, LAM, MU * MU):
        assert np.min(np.abs(kd.lambdas - target)) < 1e-7, target
    x0 = np.array([0.7, -0.3])
    truth = _koopman_example(x0, 12)[:, 1:]
    np.testing.assert_allclose(kd.predict(x0, 12), truth, atol=1e-6)


def test_eigenfunction_composition(rng):
    x, y = _example_data(rng)
    kd = KernelDmd(x, rank=6, kernel="poly", degree=2, y_data=y)
    pts = rng.uniform(-1, 1, (2, 30))
    nxt = np.stack([MU * pts[0], LAM * pts[1] + C * pts[0] ** 2])
    phi_x = kd.eigenfunctions(pts)
    phi_y = kd.eigenfunctions(nxt)
    for target in (MU, LAM, MU * MU):
        j = int(np.argmin(np.abs(kd.lambdas - target)))
        resid = phi_y[j] - kd.lambdas[j] * phi_x[j]
        scale = max(np.max(np.abs(phi_x[j])), 1e-12)
        assert np.max(np.abs(resid)) / scale < 1e-6, target


def test_rbf_kernel_forecasts(rng):
    x, y = _example_data(rng, n_traj=12, m=25)
    kd = KernelDmd(x, rank=20, kernel="rbf", length_scale=1.2, y_data=y)
    x0 = np.array([0.5, -0.2])
    truth = _koopman_example(x0, 8)[:, 1:]
    pred = kd.predict(x0, 8)
    assert np.max(np.abs(pred - truth)) < 1e-3


def test_nystrom_gram_matches_eigh(rng):
    x, y = _example_data(rng, n_traj=10, m=30)
    kd_e = KernelDmd(x, rank=6, kernel="poly", degree=2, y_data=y)
    kd_n = KernelDmd(x, rank=6, kernel="poly", degree=2, y_data=y,
                     gram_method="nystrom", key=3)
    # leading eigenvalues agree (the Gram has fast decay here)
    le = np.sort_complex(kd_e.lambdas[:4])
    ln = np.sort_complex(kd_n.lambdas[:4])
    np.testing.assert_allclose(ln, le, atol=1e-5)


def test_high_dimensional_state_stays_m_bounded(rng):
    # n = 600 state dims, m = 80 snapshots: explicit degree-2 dictionary
    # would have ~180k features; kernel route stays (80, 80)
    n, m = 600, 80
    proj = rng.standard_normal((n, 2))
    x2, y2 = _example_data(rng, n_traj=4, m=20)
    x, y = proj @ x2, proj @ y2     # embed the 2-D dynamics in R^600
    kd = KernelDmd(x, rank=6, kernel="poly", degree=2,
                   length_scale=10.0, y_data=y)
    for target in (MU, LAM):
        assert np.min(np.abs(kd.lambdas - target)) < 1e-5, target


def test_checkpoint_roundtrip(rng, tmp_path):
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    x, y = _example_data(rng, n_traj=4, m=20)
    kd = KernelDmd(x, rank=6, kernel="poly", degree=2, y_data=y)
    path = str(tmp_path / "kdmd.npz")
    save_model(path, kd)
    kd2 = load_model(path)
    np.testing.assert_allclose(kd2.lambdas, kd.lambdas)
    x0 = np.array([0.3, 0.4])
    np.testing.assert_allclose(kd2.predict(x0, 4), kd.predict(x0, 4))


def test_validation(rng):
    x = rng.standard_normal((3, 20))
    with pytest.raises(ValueError, match="kernel"):
        KernelDmd(x, 3, kernel="matern")
    with pytest.raises(ValueError, match="gram_method"):
        KernelDmd(x, 3, gram_method="svd")
    with pytest.raises(ValueError, match="rank"):
        KernelDmd(x, 0)
    with pytest.raises(ValueError, match="rank"):
        KernelDmd(x, 25)
    with pytest.raises(ValueError, match="y_data"):
        KernelDmd(x, 3, y_data=x[:, :5])
    kd = KernelDmd(x, 3)
    with pytest.raises(ValueError, match="rows"):
        kd.eigenfunctions(rng.standard_normal((5, 2)))
