"""Physics-informed DMD (Baddoo et al. 2023).

EXTENSION tests — the reference fits unconstrained operators only;
these pin the manifold-constrained fits: the spectrum lands ON the
manifold's locus by construction, and under noise the constrained fit
beats the unconstrained one on systems that obey the constraint.
"""
import numpy as np
import pytest

from corrla_rs_tpu import DMD, PiDmd
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def _rotation_data(rng, n_x=16, n_t=200, noise=0.0):
    """Trajectory of a random orthogonal (energy-conserving) operator."""
    q, _ = np.linalg.qr(rng.standard_normal((n_x, n_x)))
    x = np.empty((n_x, n_t))
    x[:, 0] = rng.standard_normal(n_x)
    for k in range(1, n_t):
        x[:, k] = q @ x[:, k - 1]
    if noise:
        x = x + noise * rng.standard_normal(x.shape)
    return x, q


def test_orthogonal_unit_circle_and_energy(rng):
    x, _ = _rotation_data(rng, noise=0.02)
    fit = PiDmd(x, n_modes=16, family="orthogonal")
    # spectrum ON the unit circle by construction (machine precision)
    np.testing.assert_allclose(np.abs(fit.lambdas), 1.0, atol=1e-10)
    # unconstrained DMD decays/grows under the same noise
    plain = DMD(x, 16)
    assert np.max(np.abs(np.abs(plain.lambdas) - 1.0)) > 1e-4
    # rollout conserves energy exactly
    x0 = np.asarray(x[:, 0])
    pred = np.asarray(fit.predict_multiple(x0, 50))
    norms = np.linalg.norm(pred, axis=0)
    np.testing.assert_allclose(norms, np.linalg.norm(x0), rtol=1e-8)


def test_orthogonal_beats_plain_dmd_on_noisy_rotation(rng):
    x, q = _rotation_data(rng, n_x=12, n_t=300, noise=0.05)
    lam_true = np.linalg.eigvals(q)
    fit = PiDmd(x, n_modes=12, family="orthogonal")
    plain = DMD(x, 12)

    def spec_err(lams):
        lams = np.asarray(lams)
        err = 0.0
        for lt in lam_true:
            err += np.min(np.abs(lams - lt))
        return err

    assert spec_err(fit.lambdas) < spec_err(plain.lambdas)


def test_symmetric_real_spectrum(rng):
    # slow-decay spectrum so the trajectory still excites the top modes
    # at the end of the window (0.98^60 ~ 0.3)
    q, _ = np.linalg.qr(rng.standard_normal((10, 10)))
    lam_true = np.linspace(0.5, 0.98, 10)
    a = q @ np.diag(lam_true) @ q.T
    x = np.empty((10, 60))
    x[:, 0] = rng.standard_normal(10)
    for k in range(1, 60):
        x[:, k] = a @ x[:, k - 1]
    x += 1e-5 * rng.standard_normal(x.shape)
    fit = PiDmd(x, n_modes=10, family="symmetric")
    atil = np.asarray(fit.a_til)
    np.testing.assert_allclose(atil, atil.T, atol=1e-12)  # on-manifold
    assert np.max(np.abs(fit.lambdas.imag)) < 1e-10       # real spectrum
    got = np.sort(fit.lambdas.real)
    # dominant eigenvalues recovered (small ones drown in noise)
    np.testing.assert_allclose(got[-3:], lam_true[-3:], atol=5e-3)


def test_skewsymmetric_imaginary_spectrum(rng):
    a = rng.standard_normal((8, 8))
    a = 0.3 * (a - a.T)
    from scipy.linalg import expm

    op = expm(a)  # orthogonal with log skew; fit the log via x_{k+1}=op x_k
    x = np.empty((8, 120))
    x[:, 0] = rng.standard_normal(8)
    for k in range(1, 120):
        x[:, k] = a @ x[:, k - 1] + x[:, k - 1]  # (I + A) step, A skew part
    fit = PiDmd(x - x.mean(), n_modes=8, family="skewsymmetric")
    atil = np.asarray(fit.a_til)
    np.testing.assert_allclose(atil, -atil.T, atol=1e-12)
    assert np.max(np.abs(fit.lambdas.real)) < 1e-10
    del op


def test_diagonal_exact(rng):
    gains = rng.uniform(0.5, 1.1, size=20)
    x = np.empty((20, 60))
    x[:, 0] = rng.standard_normal(20)
    for k in range(1, 60):
        x[:, k] = gains * x[:, k - 1]
    fit = PiDmd(x, family="diagonal")
    np.testing.assert_allclose(np.asarray(fit.gains), gains, atol=1e-9)
    pred = np.asarray(fit.predict_multiple(x[:, 0], 59))
    np.testing.assert_allclose(pred, x[:, 1:], rtol=1e-6, atol=1e-9)


def test_circulant_periodic_advection(rng):
    # x_{k+1} = roll(x_k, 1): circulant with eigenvalues e^{-2pi i k/n}
    n_x = 32
    x = np.empty((n_x, 100))
    x[:, 0] = rng.standard_normal(n_x)
    for k in range(1, 100):
        x[:, k] = np.roll(x[:, k - 1], 1)
    fit = PiDmd(x, family="circulant")
    lam_true = np.exp(-2j * np.pi * np.arange(n_x) / n_x)
    np.testing.assert_allclose(fit.lambdas, lam_true, atol=1e-8)
    pred = np.asarray(fit.predict_multiple(x[:, 0], 40))
    np.testing.assert_allclose(pred, x[:, 1:41], atol=1e-7)


def test_pidmd_validation_and_checkpoint(tmp_path, rng):
    x, _ = _rotation_data(rng, n_x=8, n_t=40)
    with pytest.raises(ValueError, match="family"):
        PiDmd(x, 4, family="toeplitz")
    with pytest.raises(ValueError, match="n_modes"):
        PiDmd(x, 0, family="orthogonal")
    with pytest.raises(ValueError, match="x_data"):
        PiDmd(x[:, :2], 2)
    for fam, nm in (("orthogonal", 8), ("diagonal", 0),
                    ("circulant", 0)):
        fit = PiDmd(x, nm, family=fam)
        p = str(tmp_path / f"pidmd_{fam}.npz")
        save_model(p, fit)
        fit2 = load_model(p)
        assert isinstance(fit2, PiDmd) and fit2.family == fam
        np.testing.assert_allclose(
            np.asarray(fit2.predict_multiple(x[:, 0], 5)),
            np.asarray(fit.predict_multiple(x[:, 0], 5)), atol=1e-10)
        with pytest.raises(ValueError, match="x_0"):
            fit.predict_multiple(np.zeros(5), 3)
