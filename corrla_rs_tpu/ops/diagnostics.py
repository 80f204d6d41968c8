"""MCMC convergence diagnostics.

The reference's only sampler metric is the global acceptance ratio
(space_samplers.rs:396-398). Production MCMC needs convergence checks;
this module provides the standard ones over the (n_generations, n_chains,
ndim) histories that DeMcSampler / DreamSampler / the sharded runners
produce:

- ``gelman_rubin``: split-chain potential-scale-reduction R-hat
  (Gelman et al., BDA3 / Vehtari et al. 2021 split-R-hat).
- ``effective_sample_size``: autocorrelation-based ESS via FFT
  (Geyer initial positive sequence).
- ``rank_normalized_rhat``: the Vehtari et al. 2021 rank-normalized +
  folded split-R-hat (catches scale-only mixing failures and heavy
  tails that plain R-hat misses).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["gelman_rubin", "effective_sample_size", "rank_normalized_rhat"]


def _split_chains(history):
    """(n, m, d) -> (n//2, 2m, d): split each chain in half (split R-hat)."""
    n = (history.shape[0] // 2) * 2
    h = history[:n]
    first, second = h[: n // 2], h[n // 2:]
    return jnp.concatenate([first, second], axis=1)


def gelman_rubin(history) -> jnp.ndarray:
    """Split-chain R-hat per dimension; values near 1 indicate convergence.

    Args:
      history: (n_generations, n_chains, ndim) chain samples (post burn-in).
    Returns:
      (ndim,) potential scale reduction factors.
    """
    h = _split_chains(jnp.asarray(history))
    n, m, _d = h.shape
    chain_means = jnp.mean(h, axis=0)              # (m, d)
    grand_mean = jnp.mean(chain_means, axis=0)     # (d,)
    b = n / (m - 1.0) * jnp.sum(
        (chain_means - grand_mean[None, :]) ** 2, axis=0
    )
    w = jnp.mean(jnp.var(h, axis=0, ddof=1), axis=0)  # (d,) within-chain var
    var_plus = (n - 1.0) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def effective_sample_size(history) -> jnp.ndarray:
    """ESS per dimension via FFT autocorrelation (Geyer truncation).

    Args:
      history: (n_generations, n_chains, ndim).
    Returns:
      (ndim,) effective sample sizes (total across chains).

    Host-side numpy implementation (FFT sizes are data-dependent and this
    is a post-processing diagnostic, not a hot path).
    """
    h = np.asarray(history, dtype=np.float64)
    n, m, d = h.shape
    ess = np.zeros(d)
    for k in range(d):
        x = h[:, :, k]
        x = x - x.mean(axis=0, keepdims=True)
        nfft = int(2 ** np.ceil(np.log2(2 * n)))
        f = np.fft.rfft(x, n=nfft, axis=0)
        acov = np.fft.irfft(f * np.conj(f), n=nfft, axis=0)[:n].real
        acov /= np.arange(n, 0, -1)[:, None]
        # chain-averaged autocorrelation (Vehtari et al. combine W and B)
        w = acov[0].mean()
        var_plus = w * (n - 1) / n + x.mean(axis=0).var(ddof=1 if m > 1 else 0)
        rho = 1.0 - (w - acov[1:].mean(axis=1)) / var_plus
        # Geyer initial positive sequence over pairs
        tau = 1.0
        for t in range(0, len(rho) - 1, 2):
            pair = rho[t] + rho[t + 1]
            if pair < 0:
                break
            tau += 2.0 * pair
        ess[k] = n * m / tau
    return jnp.asarray(ess)


def rank_normalized_rhat(history) -> jnp.ndarray:
    """Rank-normalized + folded split-R-hat (Vehtari et al. 2021).

    The modern convergence check: plain R-hat misses poor mixing when
    chains differ in scale but not location (and vice versa), and is
    distorted by heavy tails. This computes split-R-hat on
    rank-normalized draws (max of the bulk statistic and the folded
    statistic on |x - median|, which targets the tails). Convergence
    rule of thumb: max over dims < 1.01.

    Args:
      history: (n_generations, n_chains, ndim) post burn-in.
    Returns:
      (ndim,) rank-normalized R-hat values.

    Host-side (numpy tie-averaged ranks), like ``effective_sample_size``
    — a post-processing diagnostic, not a hot path.
    """
    from jax.scipy.special import ndtri

    h = np.asarray(history, dtype=np.float64)
    n, m, d = h.shape

    def _rank_normal(x):
        # x: (n, m) one dimension; AVERAGE ranks over the pooled draws
        # (MCMC histories are tie-heavy — every rejection duplicates the
        # previous draw; position-based ranks would split tie blocks
        # systematically by chain and inflate R-hat on converged chains),
        # Blom offset, standard-normal quantile transform. Tie-averaged
        # ranks via numpy unique (no scipy dependency): the 1-based
        # average rank of a tie block of size c starting after s smaller
        # values is s + (c + 1)/2.
        flat = x.reshape(-1)
        _uniq, inv, counts = np.unique(
            flat, return_inverse=True, return_counts=True
        )
        start = np.cumsum(counts) - counts
        ranks = (start + (counts + 1) / 2.0)[inv]
        z = np.asarray(ndtri((ranks - 0.375) / (flat.size + 0.25)))
        return z.reshape(n, m)

    out = []
    for k in range(d):
        x = h[:, :, k]
        bulk = float(gelman_rubin(_rank_normal(x)[:, :, None])[0])
        folded = np.abs(x - np.median(x))
        tail = float(gelman_rubin(_rank_normal(folded)[:, :, None])[0])
        out.append(max(bulk, tail))
    return jnp.asarray(out)
