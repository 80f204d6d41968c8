"""Spectral POD (Towne-Schmidt-Colonius 2018).

EXTENSION tests — the reference's POD (pod_rom.rs) is space-only; these
pin the frequency-domain decomposition: Welch-PSD parity on one channel
(exact oracle: for n_x=1 the leading SPOD eigenvalue IS the Welch PSD),
tonal peak recovery with mode shapes, per-frequency orthonormality, and
checkpointing.
"""
import numpy as np
import pytest

from corrla_rs_tpu import Spod, spod
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def test_spod_single_channel_matches_welch_psd(rng):
    # for one channel the method-of-snapshots Gram is rank 1 and its
    # eigenvalue is exactly the block-averaged periodogram -> Welch
    from scipy import signal

    x = rng.standard_normal(4096)
    x = x + 0.5 * np.sin(2 * np.pi * 0.2 * np.arange(4096))
    dt = 0.5
    fit = spod(x[None, :], n_fft=256, overlap=0.5, dt=dt)
    f_ref, pxx = signal.welch(
        x - x.mean(), fs=1.0 / dt, window="hann", nperseg=256,
        noverlap=128, detrend=False, scaling="density",
    )
    np.testing.assert_allclose(np.asarray(fit.freqs), f_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(fit.energies[:, 0]), pxx,
                               rtol=1e-8, atol=1e-12)


def test_spod_two_tone_peaks_and_mode_shapes(rng):
    # two on-bin tones with distinct spatial shapes + weak noise
    n_x, n_t, n_fft = 24, 4096, 128
    s = np.linspace(0, 1, n_x)
    t = np.arange(n_t, dtype=float)
    a1 = np.sin(np.pi * s)
    a2 = np.cos(2 * np.pi * s)
    x = (np.outer(a1, np.cos(2 * np.pi * (16 / n_fft) * t))
         + 0.7 * np.outer(a2, np.sin(2 * np.pi * (32 / n_fft) * t))
         + 0.01 * rng.standard_normal((n_x, n_t)))
    fit = spod(x, n_fft=n_fft, overlap=0.5)
    peaks = fit.peak_frequencies(2)
    np.testing.assert_allclose(peaks, [16 / n_fft, 32 / n_fft],
                               atol=1e-12)
    # leading mode at each tone aligns with its spatial shape
    for bin_i, shape in ((16, a1), (32, a2)):
        re, im = fit.mode(bin_i, 0)
        phi = np.asarray(re) + 1j * np.asarray(im)
        u = shape / np.linalg.norm(shape)
        assert np.abs(np.vdot(u, phi)) > 0.999
        # and dominates the second mode there (noise floor)
        e = np.asarray(fit.energies[bin_i])
        assert e[0] > 50 * e[1]


def test_spod_orthonormal_and_sorted(rng):
    x = rng.standard_normal((10, 1024))
    fit = spod(x, n_fft=64, overlap=0.5, n_modes=5)
    e = np.asarray(fit.energies)
    assert e.shape == (33, 5)
    assert np.all(e >= -1e-12)
    assert np.all(np.diff(e, axis=1) <= 1e-10)  # descending in j
    for bin_i in (3, 17, 30):
        phi = (np.asarray(fit.modes_re[bin_i])
               + 1j * np.asarray(fit.modes_im[bin_i]))
        gram = phi.conj().T @ phi
        np.testing.assert_allclose(gram, np.eye(5), atol=1e-8)


def test_spod_energy_accounts_for_variance(rng):
    # integral of the modal spectra ~ total variance (Welch-consistent
    # to within windowing bias on broadband data)
    x = rng.standard_normal((6, 8192))
    dt = 1.0
    fit = spod(x, n_fft=128, overlap=0.5, dt=dt)
    df = 1.0 / (128 * dt)
    total = float(np.sum(np.asarray(fit.energies))) * df
    var = float(np.sum(np.var(x, axis=1)))
    assert abs(total - var) / var < 0.1


def test_spod_sharded_same_answer(rng):
    # row-sharded SPOD over the 8-device mesh: identical energies, and
    # leading modes align at the tonal bins (eigenvectors of noise-floor
    # eigenvalues are not comparable)
    from corrla_rs_tpu.parallel.mesh import make_mesh

    n_x, n_t, n_fft = 32, 2048, 128
    s = np.linspace(0, 1, n_x)
    t = np.arange(n_t, dtype=float)
    x = (np.outer(np.sin(np.pi * s), np.cos(2 * np.pi * (16 / n_fft) * t))
         + 0.01 * rng.standard_normal((n_x, n_t)))
    single = spod(x, n_fft=n_fft, overlap=0.5, n_modes=4)
    shard = spod(x, n_fft=n_fft, overlap=0.5, n_modes=4,
                 mesh=make_mesh(8))
    np.testing.assert_allclose(np.asarray(shard.energies),
                               np.asarray(single.energies),
                               rtol=1e-9, atol=1e-12)
    p1 = (np.asarray(single.modes_re[16, :, 0])
          + 1j * np.asarray(single.modes_im[16, :, 0]))
    p2 = (np.asarray(shard.modes_re[16, :, 0])
          + 1j * np.asarray(shard.modes_im[16, :, 0]))
    assert np.abs(np.vdot(p1, p2)) > 1 - 1e-9


def test_spod_rank_deficient_gram(rng):
    # n_x < n_blocks: the cross-spectral Gram is rank-deficient at
    # every frequency. Regression: the near-zero eigenvalues must give
    # exactly-zero mode columns (an absolute eigenvalue floor produced
    # ~1e134-scaled garbage), energies must be >= 0, and the energetic
    # modes stay orthonormal.
    fit = spod(rng.standard_normal((3, 600)), n_fft=64, overlap=0.5)
    e = np.asarray(fit.energies)
    re, im = np.asarray(fit.modes_re), np.asarray(fit.modes_im)
    assert np.all(np.isfinite(re)) and np.all(np.isfinite(im))
    assert np.all(e >= 0)
    assert np.max(np.abs(re)) < 10 and np.max(np.abs(im)) < 10
    # junk directions are exactly zero; energetic ones orthonormal
    for bin_i in (5, 20):
        phi = re[bin_i] + 1j * im[bin_i]
        norms = np.linalg.norm(phi, axis=0)
        good = norms > 0.5
        assert np.sum(good) <= 3
        assert np.all(norms[~good] < 1e-6)  # zero or floor-tiny
        g = phi[:, good].conj().T @ phi[:, good]
        np.testing.assert_allclose(g, np.eye(int(np.sum(good))),
                                   atol=1e-8)


def test_spod_energy_interval(rng):
    # chi-squared band: brackets the energies, tightens with blocks,
    # and on white noise the TRUE flat spectrum falls inside the band
    # at most frequencies
    x = rng.standard_normal((4, 8192))
    fit = spod(x, n_fft=128, overlap=0.5, n_modes=1)
    lo, hi = fit.energy_interval(0.95)
    e = np.asarray(fit.energies)
    assert np.all(lo < e) and np.all(e < hi)
    short = spod(x[:, :1024], n_fft=128, overlap=0.5, n_modes=1)
    lo_s, hi_s = short.energy_interval(0.95)
    # fewer blocks -> wider relative band
    assert (hi_s / np.asarray(short.energies)).mean() > (
        hi / e).mean()
    with pytest.raises(ValueError, match="confidence"):
        fit.energy_interval(1.5)


def test_spod_validation_and_checkpoint(tmp_path, rng):
    x = rng.standard_normal((4, 300))
    with pytest.raises(ValueError, match="n_fft"):
        spod(x, n_fft=2048)
    with pytest.raises(ValueError, match="overlap"):
        spod(x, n_fft=64, overlap=1.0)
    with pytest.raises(ValueError, match="window"):
        spod(x, n_fft=64, window="hamming")
    with pytest.raises(ValueError, match="blocks"):
        spod(x[:, :64], n_fft=64)
    with pytest.raises(ValueError, match="2-d"):
        spod(x[0], n_fft=64)
    fit = spod(x, n_fft=64, n_modes=3)
    assert isinstance(fit, Spod) and fit.n_freq == 33
    path = str(tmp_path / "spod.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, Spod)
    np.testing.assert_allclose(np.asarray(fit2.energies),
                               np.asarray(fit.energies), atol=1e-12)
    np.testing.assert_allclose(np.asarray(fit2.modes_re),
                               np.asarray(fit.modes_re), atol=1e-12)


def test_spod_weighted_inner_product(rng):
    # non-uniform quadrature weights: modes come back W-orthonormal,
    # and on a uniform-weight vector the result equals the unweighted
    # path exactly
    n_x, n_t, n_fft = 12, 2048, 64
    x = rng.standard_normal((n_x, n_t))
    w = rng.uniform(0.2, 3.0, n_x)
    fit = spod(x, n_fft=n_fft, n_modes=4, weights=w)
    for bin_i in (3, 17):
        phi = (np.asarray(fit.modes_re[bin_i])
               + 1j * np.asarray(fit.modes_im[bin_i]))
        gram = phi.conj().T @ (w[:, None] * phi)
        np.testing.assert_allclose(gram, np.eye(4), atol=1e-8)
    uni = spod(x, n_fft=n_fft, n_modes=4, weights=np.ones(n_x))
    ref = spod(x, n_fft=n_fft, n_modes=4)
    np.testing.assert_allclose(np.asarray(uni.energies),
                               np.asarray(ref.energies), atol=1e-12)
    np.testing.assert_allclose(np.asarray(uni.modes_re),
                               np.asarray(ref.modes_re), atol=1e-10)
    with pytest.raises(ValueError, match="weights"):
        spod(x, n_fft=n_fft, weights=np.ones(5))
    with pytest.raises(ValueError, match="weights"):
        spod(x, n_fft=n_fft, weights=-np.ones(n_x))
