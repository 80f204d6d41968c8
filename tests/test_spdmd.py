"""Sparsity-promoting DMD amplitude selection (Jovanovic et al. 2014).

EXTENSION tests — the reference has no mode-selection story; these pin
the Pareto behavior: gamma=0 reproduces the LS optimum, a suitable
gamma recovers EXACTLY the planted modes, and nnz is monotone in gamma.
"""
import numpy as np
import pytest

from corrla_rs_tpu import DMD, spdmd


def _planted(rng, n_x=24, m=120):
    """Three planted spatial modes with distinct dynamics + faint noise
    (the noise makes a rank-8 fit carry 5 junk modes)."""
    t = np.arange(m)
    alphas = np.array([0.995 * np.exp(1j * 0.5), 0.995 * np.exp(-1j * 0.5),
                       0.93])
    phi = rng.standard_normal((n_x, 3)) + 1j * rng.standard_normal((n_x, 3))
    phi[:, 1] = np.conj(phi[:, 0])
    b = np.array([1.0, 1.0, 1.4])
    x = np.real(phi @ (b[:, None] * alphas[:, None] ** t[None, :]))
    return x + 1e-6 * rng.standard_normal((n_x, m)), alphas


def test_spdmd_gamma0_is_least_squares(rng):
    x, _ = _planted(rng)
    fit = DMD(x, 8)
    out = spdmd(fit, x, gammas=0.0)
    assert out["nnz"][0] == 8
    # gamma=0 performance equals the unregularized floor
    np.testing.assert_allclose(out["ploss_pct"][0],
                               out["ploss_floor_pct"], atol=1e-8)


def test_spdmd_selects_planted_modes(rng):
    x, alphas = _planted(rng)
    fit = DMD(x, 8)
    gammas = np.logspace(-8, 4, 13)
    out = spdmd(fit, x, gammas)
    # nnz decreases (weakly) along the gamma sweep, spanning the front
    assert np.all(np.diff(out["nnz"]) <= 0)
    assert out["nnz"][0] >= 5          # tiny gamma keeps junk modes
    # some gamma keeps exactly the 3 planted modes with tiny loss
    hit = [i for i in range(len(gammas))
           if out["nnz"][i] == 3 and out["ploss_pct"][i] < 0.1]
    assert hit, (out["nnz"], out["ploss_pct"])
    i = hit[0]
    keep = np.abs(out["amplitudes"][i]) > 0
    lam_kept = np.sort_complex(fit.lambdas[keep])
    np.testing.assert_allclose(lam_kept, np.sort_complex(alphas),
                               atol=1e-4)
    # and the largest gamma kills everything or nearly so
    assert out["nnz"][-1] <= 1
    assert out["ploss_pct"][-1] > 50


def test_spdmd_validation(rng):
    x, _ = _planted(rng)
    fit = DMD(x, 4)
    with pytest.raises(ValueError, match="x_data"):
        spdmd(fit, x[:5], 0.1)
    with pytest.raises(ValueError, match="gammas"):
        spdmd(fit, x, [-1.0])
