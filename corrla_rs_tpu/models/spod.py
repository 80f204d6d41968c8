"""Spectral POD (SPOD) — EXTENSION (no reference analogue).

The reference's POD (pod_rom.rs) diagonalizes the space-only covariance,
mixing all timescales into each mode. SPOD (Lumley's space-time POD in
the frequency domain; Towne, Schmidt & Colonius 2018) diagonalizes the
cross-spectral density at EACH frequency, giving modes that are
orthogonal at every frequency, optimally energy-ranked there, and —
unlike DMD modes — statistically converged for stationary turbulent
data (it is exactly the frequency-domain Karhunen-Loeve expansion).

TPU-first shape (this device has no complex dtypes and no fast native
FFT path — but it has an MXU):
- Welch segmentation is ONE gather: (n_blocks, n_x, n_fft).
- The windowed real DFT is TWO real matmuls against precomputed
  cos/sin bases, (B n_x, n_fft) x (n_fft, n_freq) — pure MXU work,
  no complex arithmetic anywhere on device.
- Per-frequency SPOD uses the method of snapshots: the B x B Hermitian
  cross-spectral Gram M = Q^H Q splits into real/imag parts by matmuls,
  and its eigendecomposition runs as ONE vmapped real eigh of the
  2B x 2B embedding [[M_re, -M_im], [M_im, M_re]] over all frequencies
  (the embedding's spectrum is each eigenvalue doubled; eigenvectors
  are (v_re; v_im) and (-v_im; v_re) — we take one per pair).
- Mode lift Phi_f = Q_f V_f Lambda_f^{-1/2} is a batched matmul.
Everything from windowing to modes is a single jit.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.mat_utils import PRECISION
from corrla_rs_tpu.utils.checkpoint import register_model_class

__all__ = ["Spod", "spod"]

_mm = functools.partial(jnp.matmul, precision=PRECISION)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "n_blocks"))
def _spod_kernel(x, window, n_fft, hop, n_blocks):
    """(energies (n_freq, B), phi_re/phi_im (n_freq, n_x, B)) from
    snapshot columns x (n_x, n_t). All-real algebra; see module doc."""
    n_x = x.shape[0]
    dtype = x.dtype
    # Welch blocks: one gather -> (B, n_x, n_fft), windowed
    idx = (jnp.arange(n_blocks)[:, None] * hop
           + jnp.arange(n_fft)[None, :])              # (B, n_fft)
    blocks = x[:, idx] * window[None, None, :]        # (n_x, B, n_fft)
    blocks = jnp.transpose(blocks, (1, 0, 2))         # (B, n_x, n_fft)
    # real DFT as two matmuls (rfft bins 0..n_fft//2)
    n_freq = n_fft // 2 + 1
    k = jnp.arange(n_fft, dtype=dtype)[:, None]
    f = jnp.arange(n_freq, dtype=dtype)[None, :]
    ang = 2.0 * jnp.pi * k * f / n_fft
    flat = blocks.reshape(n_blocks * n_x, n_fft)
    q_re = _mm(flat, jnp.cos(ang)).reshape(n_blocks, n_x, n_freq)
    q_im = _mm(flat, -jnp.sin(ang)).reshape(n_blocks, n_x, n_freq)
    # frequency-major realizations: (n_freq, n_x, B)
    q_re = jnp.transpose(q_re, (2, 1, 0))
    q_im = jnp.transpose(q_im, (2, 1, 0))

    def per_freq(qr, qi):
        # Hermitian Gram M = Q^H Q / B, split re/im
        m_re = (_mm(qr.T, qr) + _mm(qi.T, qi)) / n_blocks
        m_im = (_mm(qr.T, qi) - _mm(qi.T, qr)) / n_blocks
        # real 2B x 2B embedding; eigh ascending, eigenvalues doubled
        top = jnp.concatenate([m_re, -m_im], axis=1)
        bot = jnp.concatenate([m_im, m_re], axis=1)
        w, v = jnp.linalg.eigh(jnp.concatenate([top, bot], axis=0))
        # one representative per doubled pair, descending energy:
        # ascending-order columns 2B-1, 2B-3, ... -> indices ::-2
        w = w[::-2]                                    # (B,) descending
        v_re = v[:n_blocks, ::-2]                      # (B, B)
        v_im = v[n_blocks:, ::-2]
        # lift: Phi = Q V / sqrt(B * lambda)  (complex, split parts)
        scale = 1.0 / jnp.sqrt(jnp.maximum(w, 1e-300) * n_blocks)
        p_re = (_mm(qr, v_re) - _mm(qi, v_im)) * scale[None, :]
        p_im = (_mm(qr, v_im) + _mm(qi, v_re)) * scale[None, :]
        return w, p_re, p_im

    return jax.vmap(per_freq)(q_re, q_im)


@register_model_class
class Spod:
    """Fitted SPOD (see :func:`spod`).

    ``freqs`` (n_freq,) — rfft frequencies in cycles / time unit;
    ``energies`` (n_freq, n_save) — modal energy spectra (lambda_j(f),
    descending in j; lambda_1(f) is THE spectrum to plot);
    ``modes_re``/``modes_im`` (n_freq, n_x, n_save) — SPOD modes,
    orthonormal within each frequency: Phi_f^H Phi_f = I.
    """

    @property
    def n_freq(self) -> int:
        return int(self.energies.shape[0])

    def mode(self, i_freq: int, j: int = 0):
        """(re, im) spatial shape of mode j at frequency bin i_freq."""
        return (self.modes_re[i_freq, :, j],
                self.modes_im[i_freq, :, j])

    def energy_interval(self, confidence: float = 0.95):
        """(lo, hi) multiplicative confidence bounds on ``energies``.

        Each SPOD eigenvalue is a mean over ``n_blocks`` (approximately
        independent) Welch realizations, so lambda_hat / lambda follows
        chi2(2 n_blocks) / (2 n_blocks) (Schmidt & Colonius, AIAA J.
        2020 sec. IV); the returned arrays are energies * factor."""
        from scipy.stats import chi2

        if not 0.0 < confidence < 1.0:
            raise ValueError(
                f"confidence must be in (0, 1), got {confidence}"
            )
        a = 1.0 - float(confidence)
        dof = 2 * self.n_blocks
        lo = dof / chi2.ppf(1.0 - a / 2.0, dof)
        hi = dof / chi2.ppf(a / 2.0, dof)
        e = np.asarray(self.energies)
        return e * lo, e * hi

    def peak_frequencies(self, n_peaks: int = 1) -> np.ndarray:
        """Frequencies of the n_peaks largest leading-mode energies
        (excludes the DC bin)."""
        lead = np.asarray(self.energies[:, 0]).copy()
        lead[0] = -np.inf
        order = np.argsort(lead)[::-1][: int(n_peaks)]
        return np.asarray(self.freqs)[np.sort(order)]


def spod(x_data, n_fft: int = 128, overlap: float = 0.5,
         dt: float = 1.0, window: str = "hann",
         n_modes: int | None = None, mesh=None) -> Spod:
    """Spectral POD of snapshot columns x_data (n_x, n_t).

    n_fft: Welch block length (frequency resolution 1/(n_fft dt));
    overlap: fractional block overlap in [0, 1); dt: sample spacing;
    window: 'hann' or 'boxcar'; n_modes: modes kept per frequency
    (default: all n_blocks); mesh: optional 1-D jax.sharding.Mesh —
    rows of x shard across devices (blocks/DFT/mode-lift stay
    device-local; only the B x B cross-spectral Grams reduce over the
    row axis, which GSPMD lowers to one psum per part), so spatial
    grids larger than one chip's HBM decompose unchanged.

    Follows Towne-Schmidt-Colonius 2018 (alg. in sec. 3): mean removal,
    windowed Welch blocks, per-frequency method-of-snapshots
    eigendecomposition. Energies are scaled like the one-sided Welch
    PSD (window power normalization, x2 on interior bins) so
    sum_f sum_j lambda_j(f) * (1/(n_fft dt)) ~= var(x) for stationary
    data.
    """
    x = jnp.asarray(x_data)
    if x.ndim != 2:
        raise ValueError(f"x_data must be 2-d, got {x.ndim}-d")
    n_x, n_t = int(x.shape[0]), int(x.shape[1])
    n_fft = int(n_fft)
    if not 4 <= n_fft <= n_t:
        raise ValueError(
            f"n_fft must be in [4, n_t={n_t}], got {n_fft}"
        )
    if not 0.0 <= float(overlap) < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")
    hop = max(1, int(round(n_fft * (1.0 - float(overlap)))))
    n_blocks = (n_t - n_fft) // hop + 1
    if n_blocks < 2:
        raise ValueError(
            f"need >= 2 Welch blocks (n_t={n_t}, n_fft={n_fft}, "
            f"hop={hop} gives {n_blocks}); shorten n_fft or raise overlap"
        )
    if window == "hann":
        w_np = 0.5 - 0.5 * np.cos(
            2.0 * np.pi * np.arange(n_fft) / n_fft
        )
    elif window == "boxcar":
        w_np = np.ones(n_fft)
    else:
        raise ValueError(
            f"window must be 'hann' or 'boxcar', got {window!r}"
        )
    # one-sided Welch scaling: per-block DFTs x sqrt(2 dt / (n_fft W))
    # (W = mean squared window) => lambda has PSD units; DC/Nyquist
    # keep the one-sided doubling off
    w_pow = float(np.sum(w_np ** 2))
    if mesh is not None:
        from corrla_rs_tpu.parallel.mesh import shard_rows

        x = shard_rows(x, mesh)
    x = x - jnp.mean(x, axis=1, keepdims=True)
    win = jnp.asarray(w_np * np.sqrt(2.0 * float(dt) / w_pow), x.dtype)

    energies, p_re, p_im = _spod_kernel(x, win, n_fft, hop, n_blocks)
    # undo the one-sided doubling at DC (and Nyquist for even n_fft)
    fix = np.ones(n_fft // 2 + 1)
    fix[0] = 0.5
    if n_fft % 2 == 0:
        fix[-1] = 0.5
    energies = energies * jnp.asarray(fix, energies.dtype)[:, None]

    keep = n_blocks if n_modes is None else min(int(n_modes), n_blocks)
    out = Spod.__new__(Spod)
    out.n_state = n_x
    out.n_blocks = n_blocks
    out.n_fft = n_fft
    out.freqs = np.fft.rfftfreq(n_fft, d=float(dt))
    out.energies = energies[:, :keep]
    out.modes_re = p_re[:, :, :keep]
    out.modes_im = p_im[:, :, :keep]
    return out
