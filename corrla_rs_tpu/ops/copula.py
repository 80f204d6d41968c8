"""Gaussian copula with empirical marginals (extension).

The reference README lists copulas / vine copulas as a roadmap item it
never implemented (readme.md:49-54; SURVEY.md §2.4 item 5). This module
provides the workhorse Gaussian copula:

- ``fit``: map each marginal to normal scores via empirical ranks,
  estimate the latent correlation matrix;
- ``sample``: draw correlated normals (Cholesky), push through the normal
  CDF, and invert the stored empirical marginals by interpolation.

Everything jit-friendly: ranks via argsort, quantile inversion via
``jnp.interp`` on the sorted training marginals.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from corrla_rs_tpu.ops.mat_utils import PRECISION
from corrla_rs_tpu.utils.prng import as_key

__all__ = ["GaussianCopula"]

_SQRT2 = math.sqrt(2.0)


def _norm_cdf(z):
    return 0.5 * (1.0 + jax.scipy.special.erf(z / _SQRT2))


def _norm_ppf(u):
    return _SQRT2 * jax.scipy.special.erfinv(2.0 * u - 1.0)


class GaussianCopula:
    """Dependence model: Gaussian copula over empirical marginals."""

    def fit(self, samples):
        x = jnp.asarray(samples)
        n, d = x.shape
        # normal scores from mid-ranks (Hazen plotting positions)
        order = jnp.argsort(x, axis=0)
        ranks = jnp.zeros_like(order).at[
            order, jnp.arange(d)[None, :]
        ].set(jnp.arange(n)[:, None])
        u = (ranks + 0.5) / n
        z = _norm_ppf(u)
        zc = z - jnp.mean(z, axis=0, keepdims=True)
        corr = jnp.matmul(zc.T, zc, precision=PRECISION)
        dd = jnp.sqrt(jnp.diagonal(corr))
        self.corr = corr / (dd[:, None] * dd[None, :])
        # sorted marginals for quantile inversion
        self._marginals = jnp.sort(x, axis=0)
        self.n, self.d = n, d
        return self

    def sample(self, n_samples: int, key=0) -> jnp.ndarray:
        chol = jnp.linalg.cholesky(
            self.corr + 1e-6 * jnp.eye(self.d, dtype=self.corr.dtype)
        )
        z = jax.random.normal(
            as_key(key), (n_samples, self.d), self.corr.dtype
        )
        zc = jnp.matmul(z, chol.T, precision=PRECISION)
        u = jnp.clip(_norm_cdf(zc), 0.5 / self.n, 1.0 - 0.5 / self.n)
        # invert each empirical marginal: u -> quantile by interpolation
        grid = (jnp.arange(self.n) + 0.5) / self.n
        cols = [
            jnp.interp(u[:, j], grid, self._marginals[:, j])
            for j in range(self.d)
        ]
        return jnp.stack(cols, axis=1)
