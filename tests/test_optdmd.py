"""Optimized DMD (variable projection) and BOP-DMD.

EXTENSION tests — the reference's DMD family (dmd_rom.rs) is the
one-step least-squares operator only; these pin the continuous-time
spectral solver: exact recovery, unequal sampling (impossible for
pair-regression DMD), first-order noise debiasing, and bagged UQ.
"""
import numpy as np
import pytest

from corrla_rs_tpu import DMD, BopDmd, OptDmd, bop_dmd
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def _by_imag(z):
    """Canonical spectrum order: by imaginary part (distinct in these
    fixtures; np.sort_complex keys on real parts that only match to
    solver precision)."""
    z = np.asarray(z)
    return z[np.argsort(z.imag)]


def _two_tone(t, rng=None, n_x=12, noise=0.0):
    """Rank-4 field: two complex-conjugate mode pairs with known
    continuous eigenvalues -0.02 +/- 1.1j and -0.3 +/- 2.7j."""
    alphas = np.array([-0.02 + 1.1j, -0.02 - 1.1j,
                       -0.3 + 2.7j, -0.3 - 2.7j])
    gen = np.random.default_rng(7)
    phi = gen.standard_normal((n_x, 4)) + 1j * gen.standard_normal((n_x, 4))
    phi[:, 1] = np.conj(phi[:, 0])
    phi[:, 3] = np.conj(phi[:, 2])
    b = np.array([1.0, 1.0, 0.6, 0.6])
    x = np.real(phi @ (b[:, None] * np.exp(np.outer(alphas, t))))
    if noise and rng is not None:
        x = x + noise * rng.standard_normal(x.shape)
    return x, alphas


def test_optdmd_exact_recovery_and_forecast():
    dt = 0.1
    t = dt * np.arange(80)
    x, alphas_true = _two_tone(t)
    fit = OptDmd(x, 4, dt=dt)
    np.testing.assert_allclose(_by_imag(fit.alphas),
                               _by_imag(alphas_true), atol=1e-7)
    # reconstruction at the sample times
    rec = np.asarray(fit.predict(t))
    assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-7
    # true CONTINUOUS-time evaluation: between and beyond samples
    t_new = np.array([1.234, 5.05, 8.5, 9.7])  # last two extrapolate
    x_new, _ = _two_tone(t_new)
    np.testing.assert_allclose(np.asarray(fit.predict(t_new)), x_new,
                               atol=1e-6)
    lam = fit.eigs_discrete(dt)
    np.testing.assert_allclose(_by_imag(lam),
                               _by_imag(np.exp(alphas_true * dt)),
                               atol=1e-7)


def test_optdmd_unequal_sampling(rng):
    # jittered sample times — exact (pair-regression) DMD is undefined
    # here; optdmd fits the continuous model directly
    gaps = 0.06 + 0.08 * rng.random(90)
    t = np.concatenate([[0.0], np.cumsum(gaps)])
    x, alphas_true = _two_tone(t)
    fit = OptDmd(x, 4, t=t)
    np.testing.assert_allclose(_by_imag(fit.alphas),
                               _by_imag(alphas_true), atol=1e-6)
    rec = np.asarray(fit.predict(t))
    assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-6


def test_optdmd_noise_debias(rng):
    # Under measurement noise the exact-DMD spectrum is biased toward
    # decay (noise inflates X1); varpro is unbiased to first order
    # (Askham-Kutz 2018 sec. 4). Compare decay-rate error on the
    # dominant pair over noise realizations.
    dt = 0.1
    t = dt * np.arange(150)
    err_exact, err_opt = [], []
    for _ in range(5):
        x, alphas_true = _two_tone(t, rng=rng, n_x=24, noise=0.02)
        re_true = np.sort(alphas_true.real)[-2:]  # dominant pair: -0.02
        ex = DMD(x, 4, key=1)
        re_ex = np.sort(np.log(ex.lambdas).real / dt)[-2:]
        op = OptDmd(x, 4, dt=dt, key=1)
        re_op = np.sort(op.alphas.real)[-2:]
        err_exact.append(np.abs(re_ex - re_true).mean())
        err_opt.append(np.abs(re_op - re_true).mean())
    assert np.mean(err_opt) < 0.6 * np.mean(err_exact)
    assert np.mean(err_opt) < 5e-3


def test_optdmd_validation_and_checkpoint(tmp_path):
    dt = 0.1
    t = dt * np.arange(40)
    x, _ = _two_tone(t)
    with pytest.raises(ValueError, match="n_modes"):
        OptDmd(x, 0, dt=dt)
    with pytest.raises(ValueError, match="strictly increasing"):
        OptDmd(x, 2, t=t[::-1])
    with pytest.raises(ValueError, match="m=40"):
        OptDmd(x, 2, t=t[:10])
    with pytest.raises(ValueError, match="alpha0"):
        OptDmd(x, 2, dt=dt, alpha0=np.zeros(5, complex))
    fit = OptDmd(x, 4, dt=dt)
    path = str(tmp_path / "optdmd.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, OptDmd)
    np.testing.assert_allclose(fit2.alphas, fit.alphas, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fit2.predict(t)),
                               np.asarray(fit.predict(t)), atol=1e-10)
    # scalar-series input is promoted to one channel
    sig = np.sin(1.3 * t)
    f1 = OptDmd(sig, 2, dt=dt)
    assert np.sort(np.abs(f1.alphas.imag))[-1] == pytest.approx(1.3,
                                                                abs=1e-6)


def test_bop_dmd_uq(rng, tmp_path):
    dt = 0.1
    t = dt * np.arange(120)
    x, alphas_true = _two_tone(t, rng=rng, n_x=16, noise=0.01)
    fit = bop_dmd(x, 4, dt=dt, n_members=16, subset_frac=0.7, key=3)
    assert isinstance(fit, BopDmd)
    assert fit.alphas_all.shape == (16, 4)
    # bagged mean recovers the spectrum; scatter is small but nonzero
    np.testing.assert_allclose(_by_imag(fit.alphas_mean),
                               _by_imag(alphas_true), atol=0.05)
    assert np.all(fit.alphas_std > 0)
    assert np.max(fit.alphas_std) < 0.2
    # forecast bands: mean tracks truth, band contains it
    x_clean, _ = _two_tone(t, n_x=16)
    mean, lo_b, hi_b = fit.predict_interval(t)
    assert mean.shape == x.shape
    assert (np.linalg.norm(mean - x_clean) / np.linalg.norm(x_clean)
            < 0.05)
    # the percentile band measures MEMBER spread (not a calibrated truth
    # interval); require it to be nonempty and to carry real coverage
    assert np.all(hi_b >= lo_b) and np.mean(hi_b - lo_b) > 0
    cover = np.mean((x_clean >= lo_b) & (x_clean <= hi_b))
    assert cover > 0.3
    path = str(tmp_path / "bop.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    np.testing.assert_allclose(fit2.alphas_all, fit.alphas_all,
                               atol=1e-12)
    np.testing.assert_allclose(fit2.predict(t[:7]), fit.predict(t[:7]),
                               atol=1e-10)
    with pytest.raises(ValueError, match="n_members"):
        bop_dmd(x, 2, n_members=1)
    with pytest.raises(ValueError, match="subset_frac"):
        bop_dmd(x, 2, subset_frac=0.0)
