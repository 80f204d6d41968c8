"""Noise-robust DMD solvers (DMD(solver='tls'|'fb')): spectrum debiasing.

EXTENSION tests — the reference's DMD fit (dmd_rom.rs) is ordinary LS
only, whose eigenvalues are biased toward the unit-disk interior under
sensor noise. These pin the Hemati TLS and Dawson forward-backward
debiasing on a known oscillator.
"""
import numpy as np
import pytest

from corrla_rs_tpu import DMD
from corrla_rs_tpu.models.dmd import _sqrtm_db


def _osc_traj(rng, n=32, n_t=600, noise=0.0):
    """Neutral 2-mode oscillator + decaying real mode, lifted to R^n.

    True discrete eigenvalues: 1.0*exp(+-0.25i) (on the unit circle,
    where OLS-DMD damping bias is visible) and 0.95.
    """
    r, th = 1.0, 0.25
    block = r * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]])
    a_low = np.zeros((3, 3))
    a_low[:2, :2] = block
    a_low[2, 2] = 0.95
    q, _ = np.linalg.qr(rng.standard_normal((n, 3)))
    x_low = np.empty((3, n_t))
    x_low[:, 0] = np.array([2.0, 0.5, 3.0])
    for t in range(1, n_t):
        x_low[:, t] = a_low @ x_low[:, t - 1]
    x = q @ x_low
    if noise:
        x = x + noise * rng.standard_normal(x.shape)
    lam = np.array([r * np.exp(1j * th), r * np.exp(-1j * th), 0.95])
    return x, lam


def _spec_err(fit, lam_true):
    got = np.sort_complex(np.asarray(fit.lambdas))
    return np.max(np.abs(got - np.sort_complex(lam_true)))


@pytest.mark.parametrize("solver", ["exact", "tls", "fb"])
def test_clean_data_all_solvers_agree(rng, solver):
    x, lam_true = _osc_traj(rng, n_t=200)
    fit = DMD(x, 3, solver=solver, key=2)
    assert _spec_err(fit, lam_true) < 1e-7
    # rollout through the projected/exact modes tracks the trajectory
    pred = np.asarray(fit.predict_multiple(x[:, :1], 10))
    rel = np.linalg.norm(pred - x[:, 1:11]) / np.linalg.norm(x[:, 1:11])
    assert rel < 1e-6


def test_noise_bias_is_reduced(rng):
    x, lam_true = _osc_traj(rng, noise=0.05)
    err = {
        s: _spec_err(DMD(x, 3, solver=s, key=4), lam_true)
        for s in ("exact", "tls", "fb")
    }
    # OLS damps the unit-circle pair; both debiased solvers beat it
    assert err["tls"] < 0.6 * err["exact"]
    assert err["fb"] < 0.6 * err["exact"]


def test_noise_modulus_debiasing(rng):
    """The unit-circle pair's |lambda|: OLS pulls it inside the disk;
    tls/fb restore it. This is the headline claim of both papers."""
    x, _ = _osc_traj(rng, noise=0.05)

    def top_mod(fit):
        lam = np.asarray(fit.lambdas)
        return np.max(np.abs(lam))

    m_exact = top_mod(DMD(x, 3, solver="exact", key=9))
    m_tls = top_mod(DMD(x, 3, solver="tls", key=9))
    m_fb = top_mod(DMD(x, 3, solver="fb", key=9))
    assert m_exact < 1.0  # the bias being corrected
    assert abs(m_tls - 1.0) < abs(m_exact - 1.0)
    assert abs(m_fb - 1.0) < abs(m_exact - 1.0)


def test_sqrtm_db_matches_scipy(rng):
    import jax.numpy as jnp
    from scipy.linalg import sqrtm

    a = rng.standard_normal((6, 6))
    a = a @ a.T + 6 * np.eye(6)  # SPD: principal root well-defined
    got = np.asarray(_sqrtm_db(jnp.asarray(a)))
    want = np.real(sqrtm(a))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    # nonsymmetric with complex pair in the right half plane
    b = np.array([[0.9, -0.4, 0.0], [0.4, 0.9, 0.0], [0.1, 0.0, 0.8]])
    got_b = np.asarray(_sqrtm_db(jnp.asarray(b @ b)))
    np.testing.assert_allclose(got_b, b, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_device_eig_backend_composes_with_tls(rng):
    x, lam_true = _osc_traj(rng, n_t=200)
    fit = DMD(x, 3, solver="tls", eig_backend="device", key=2)
    assert _spec_err(fit, lam_true) < 1e-6


def test_solver_validation(rng):
    x, _ = _osc_traj(rng, n_t=50)
    with pytest.raises(ValueError, match="solver"):
        DMD(x, 3, solver="TLS")
