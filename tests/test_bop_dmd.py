"""Bagged DMD (models/bop_dmd): spectrum recovery with uncertainty bands.

EXTENSION tests — the reference's DMD fits (dmd_rom.rs) are point
estimates with no uncertainty quantification; these pin the bagging
statistics on a known linear system.
"""
import numpy as np
import pytest

from corrla_rs_tpu import BaggedDmd, bagged_dmd
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def _linear_traj(rng, n=24, n_t=120, noise=0.0):
    """Trajectory of a stable 2-mode oscillator lifted to R^n.

    True discrete eigenvalues: 0.98*exp(+-0.3i) and 0.9 (real).
    """
    r, th = 0.98, 0.3
    block = r * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
    a_low = np.zeros((3, 3))
    a_low[:2, :2] = block
    a_low[2, 2] = 0.9
    q, _ = np.linalg.qr(rng.standard_normal((n, 3)))
    x_low = np.empty((3, n_t))
    x_low[:, 0] = rng.standard_normal(3) + 2.0
    for t in range(1, n_t):
        x_low[:, t] = a_low @ x_low[:, t - 1]
    x = q @ x_low
    if noise:
        x = x + noise * rng.standard_normal(x.shape)
    return x, np.array([r * np.exp(1j * th), r * np.exp(-1j * th), 0.9])


def test_bagged_dmd_recovers_spectrum(rng):
    x, lam_true = _linear_traj(rng, noise=1e-3)
    fit = bagged_dmd(x, n_modes=3, n_members=16, key=3)
    assert isinstance(fit, BaggedDmd)
    got = np.sort_complex(fit.lambdas_mean)
    want = np.sort_complex(lam_true)
    assert np.max(np.abs(got - want)) < 5e-3
    # scatter is real uncertainty: positive, but small vs |lambda|
    assert np.all(fit.lambdas_std >= 0)
    assert np.all(fit.lambdas_std < 5e-2)
    # members were aligned: the aligned cloud hugs the reference spectrum
    d = np.abs(fit.lambdas_all - fit.lambdas_ref[None, :])
    assert np.median(d) < 5e-2


def test_bagged_dmd_noise_widens_bands(rng):
    x_lo, _ = _linear_traj(rng, noise=1e-4)
    x_hi, _ = _linear_traj(rng, noise=5e-2)
    f_lo = bagged_dmd(x_lo, n_modes=3, n_members=16, key=7)
    f_hi = bagged_dmd(x_hi, n_modes=3, n_members=16, key=7)
    assert f_hi.lambdas_std.mean() > f_lo.lambdas_std.mean()


def test_bagged_dmd_forecast_interval(rng):
    x, _ = _linear_traj(rng, noise=1e-3)
    fit = bagged_dmd(x, n_modes=3, n_members=12, key=5)
    n_steps = 10
    mean, lo, hi = fit.predict_interval(x[:, 0], n_steps)
    assert mean.shape == lo.shape == hi.shape == (x.shape[0], n_steps)
    assert np.all(lo <= hi + 1e-12)
    assert np.all((lo <= mean + 1e-9) & (mean <= hi + 1e-9))
    # the bagged mean forecast tracks the actual trajectory
    err = np.linalg.norm(mean - x[:, 1:n_steps + 1])
    assert err / np.linalg.norm(x[:, 1:n_steps + 1]) < 5e-2
    assert np.allclose(fit.predict(x[:, 0], n_steps), mean)


def test_bagged_dmd_checkpoint_roundtrip(tmp_path, rng):
    x, _ = _linear_traj(rng, n=10, n_t=60, noise=1e-3)
    fit = bagged_dmd(x, n_modes=3, n_members=8, key=1)
    path = str(tmp_path / "bop.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, BaggedDmd)
    np.testing.assert_allclose(fit2.lambdas_mean, fit.lambdas_mean)
    m1, _, _ = fit.predict_interval(x[:, 0], 5)
    m2, _, _ = fit2.predict_interval(x[:, 0], 5)
    np.testing.assert_allclose(m2, m1)


@pytest.mark.slow
def test_bagged_dmd_validation(rng):
    x, _ = _linear_traj(rng, n=8, n_t=40)
    with pytest.raises(ValueError, match="subset_frac"):
        bagged_dmd(x, n_modes=2, subset_frac=0.0)
    with pytest.raises(ValueError, match="n_members"):
        bagged_dmd(x, n_modes=2, n_members=1)
    with pytest.raises(ValueError, match="x_data"):
        bagged_dmd(x[:, :2], n_modes=2)
    with pytest.raises(ValueError, match="entries"):
        fit = bagged_dmd(x, n_modes=2, n_members=4, key=2)
        fit.predict_interval(np.zeros(3), 4)
