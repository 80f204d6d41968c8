"""Hankel (time-delay) DMD and multi-resolution DMD.

EXTENSION tests — the reference fits one operator to raw snapshots
(dmd_rom.rs); these pin the two completions that handle rank-deficient
observables (delay embedding) and transient events (recursive
timescale separation).
"""
import numpy as np
import pytest

from corrla_rs_tpu import DMD, HankelDmd, MrDmd, hankel_embed, mrdmd
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def test_hankel_embed_layout():
    x = np.arange(12.0).reshape(2, 6)  # rows [0..5], [6..11]
    h = np.asarray(hankel_embed(x, 3))
    assert h.shape == (6, 4)
    # column j = [x[:, j]; x[:, j+1]; x[:, j+2]], newest at the bottom
    np.testing.assert_allclose(h[:, 0], [0, 6, 1, 7, 2, 8])
    np.testing.assert_allclose(h[:, 3], [3, 9, 4, 10, 5, 11])


def test_hankel_scalar_two_tone_spectrum_and_forecast():
    # ONE sensor channel: direct DMD cannot resolve 4 dynamic modes,
    # a depth-16 delay embedding can (Takens).
    dt = 0.1
    t = dt * np.arange(420)
    sig = np.sin(0.5 * t) + 0.7 * np.sin(1.3 * t)
    fit = HankelDmd(sig[:400], n_delays=16, n_modes=4)
    freqs = np.sort(np.abs(np.imag(fit.eigs_continuous(dt))))
    np.testing.assert_allclose(freqs, [0.5, 0.5, 1.3, 1.3], atol=1e-8)
    assert np.max(np.abs(np.abs(fit.lambdas) - 1.0)) < 1e-8  # neutral
    # continue the training series 20 steps
    pred = np.asarray(fit.forecast(20))[0]
    np.testing.assert_allclose(pred, sig[400:420], atol=1e-7)


@pytest.mark.slow
def test_hankel_beats_direct_dmd_on_standing_wave(rng):
    # standing wave: spatial rank 1, dynamic rank 2 — the classic
    # direct-DMD failure (Tu et al. 2014 sec. 4; Brunton-Kutz book 7.5)
    s = np.linspace(0, np.pi, 48)
    t = 0.15 * np.arange(200)
    x = np.outer(np.sin(2 * s), np.cos(1.1 * t))
    direct = DMD(x[:, :180], n_modes=1)
    hank = HankelDmd(x[:, :180], n_delays=2, n_modes=2)
    truth = x[:, 180:]
    err_direct = np.linalg.norm(
        np.asarray(direct.predict_multiple(x[:, 179:180], 20)) - truth
    ) / np.linalg.norm(truth)
    err_hank = np.linalg.norm(
        np.asarray(hank.forecast(20)) - truth
    ) / np.linalg.norm(truth)
    assert err_hank < 1e-6
    assert err_direct > 0.5  # rank-1 fit decays/locks, cannot oscillate
    # state-space mode shape ~ sin(2s) up to scale/phase
    mre, mim = hank.state_modes()
    phi = np.asarray(mre)[:, 0] + 1j * np.asarray(mim)[:, 0]
    c = np.vdot(np.sin(2 * s), phi) / np.vdot(np.sin(2 * s), np.sin(2 * s))
    resid = np.linalg.norm(phi - c * np.sin(2 * s)) / np.abs(
        np.linalg.norm(phi))
    assert resid < 1e-6


def test_hankel_forecast_from_history_and_checkpoint(tmp_path):
    dt = 0.2
    t = dt * np.arange(300)
    sig = np.cos(0.9 * t) + 0.3 * np.sin(0.4 * t)
    fit = HankelDmd(sig[:260], n_delays=12, n_modes=4)
    # seed from an explicit history window ending mid-series
    pred = np.asarray(fit.forecast(15, x_hist=sig[None, :200]))[0]
    np.testing.assert_allclose(pred, sig[200:215], atol=1e-6)
    path = str(tmp_path / "hankel.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, HankelDmd)
    np.testing.assert_allclose(np.asarray(fit2.forecast(10)),
                               np.asarray(fit.forecast(10)), atol=1e-10)
    with pytest.raises(ValueError, match="n_delays"):
        HankelDmd(sig, n_delays=0, n_modes=2)
    with pytest.raises(ValueError, match="embedded columns"):
        HankelDmd(sig[:5], n_delays=5, n_modes=2)
    with pytest.raises(ValueError, match="x_hist"):
        fit.forecast(5, x_hist=sig[None, :5])


def _transient_field(rng, n_x=40, n_t=256):
    """Slow global oscillation + a fast burst confined to the 3rd
    quarter of the window.  Both components are traveling (spatial
    rank 2) so each IS linear-representable by a node DMD — a standing
    (rank-1) pattern is unrecoverable by ANY plain DMD (that failure
    mode is what HankelDmd exists for; see the standing-wave test)."""
    s = np.linspace(0, 1, n_x)
    t = np.arange(n_t, dtype=float)
    ws, wf = 2 * np.pi / 512, 2 * np.pi / 16
    slow = (np.outer(np.sin(np.pi * s), np.cos(ws * t))
            + np.outer(np.cos(np.pi * s), np.sin(ws * t)))
    gate = ((t >= 128) & (t < 192)).astype(float)
    burst = (np.outer(np.cos(3 * np.pi * s), np.sin(wf * t) * gate)
             + np.outer(np.sin(3 * np.pi * s), np.cos(wf * t) * gate))
    return slow + 0.8 * burst, slow, 0.8 * burst


@pytest.mark.slow
def test_mrdmd_separates_scales(rng):
    x, slow, burst = _transient_field(rng)
    # burst freq 2*pi/16 needs windows of ~32 steps to count as "slow"
    # (4 levels deep at n_t=256) with a 3-oscillation coherence budget
    fit = mrdmd(x, n_modes=6, max_levels=4, max_cycles=3.0)
    assert fit.n_nodes >= 4
    assert 0 in fit.levels and max(fit.levels) == 3
    full = np.asarray(fit.reconstruct())
    assert np.linalg.norm(full - x) / np.linalg.norm(x) < 0.25
    # level-0 captures the slow background...
    lvl0 = np.asarray(fit.reconstruct(levels=[0]))
    assert (np.linalg.norm(lvl0 - slow) / np.linalg.norm(slow)
            < np.linalg.norm(lvl0 - x) / np.linalg.norm(x))
    # ...and drops most burst energy, which deeper levels recover
    burst_win = slice(128, 192)
    res0 = np.linalg.norm((x - lvl0)[:, burst_win])
    res_all = np.linalg.norm((x - full)[:, burst_win])
    assert res_all < 0.5 * res0
    # some node below level 0 sees the burst's frequency 2 pi / 16
    deep = [f for lvl, f in zip(fit.levels, fit.node_frequencies())
            if lvl > 0 and f.size]
    assert deep and min(
        np.min(np.abs(f - 2 * np.pi / 16)) for f in deep
    ) < 0.05


def test_mrdmd_linear_system_exact():
    # a purely slow linear system is captured entirely at level 0
    t = np.arange(128, dtype=float)
    s = np.linspace(0, 1, 16)
    x = (np.outer(np.sin(np.pi * s), np.cos(2 * np.pi * t / 512))
         + np.outer(np.cos(np.pi * s), np.sin(2 * np.pi * t / 512)))
    fit = mrdmd(x, n_modes=4, max_levels=2, max_cycles=1.0)
    lvl0 = np.asarray(fit.reconstruct(levels=[0]))
    assert np.linalg.norm(lvl0 - x) / np.linalg.norm(x) < 1e-6


def test_mrdmd_checkpoint_and_validation(tmp_path, rng):
    x, _, _ = _transient_field(rng, n_x=16, n_t=128)
    fit = mrdmd(x, n_modes=4, max_levels=2)
    path = str(tmp_path / "mrdmd.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, MrDmd)
    assert fit2.levels == fit.levels and fit2.t0s == fit.t0s
    np.testing.assert_allclose(np.asarray(fit2.reconstruct()),
                               np.asarray(fit.reconstruct()), atol=1e-10)
    with pytest.raises(ValueError, match="max_levels"):
        mrdmd(x, n_modes=2, max_levels=0)
    with pytest.raises(ValueError, match="max_cycles"):
        mrdmd(x, n_modes=2, max_cycles=0.0)
    with pytest.raises(ValueError, match="n_modes"):
        mrdmd(x, n_modes=0)
