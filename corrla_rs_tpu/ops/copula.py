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

__all__ = ["GaussianCopula", "BivariateCopula"]

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


class BivariateCopula:
    """Bivariate copula with selectable family (extension).

    Completes the reference README's bivariate-copula roadmap item
    (readme.md:49-53: Gaussian, Frank, Clayton, Gumbel — all TODO there)
    as a standalone surface; the same four families also serve as the
    pair-copulas of ``ops.vine.CVineCopula``, whose kernels this class
    reuses (tau-inversion fits, h-function sampling, log-densities).

    family: one of ``ops.vine.FAMILIES`` or "auto" (AIC selection, the
    independence copula as the baseline). Marginals are empirical, like
    ``GaussianCopula``.
    """

    def __init__(self, family: str = "auto", refine: bool = False):
        from corrla_rs_tpu.ops.vine import FAMILIES

        if family != "auto" and family not in FAMILIES:
            raise ValueError(
                f"family must be 'auto' or one of {FAMILIES}, got {family!r}"
            )
        self.family = family
        # refine=True: golden-section MLE of theta seeded by tau inversion
        self.refine = bool(refine)

    def fit(self, samples):
        """samples: (n, 2). Rank-transform to uniforms, fit theta by
        Kendall-tau inversion (family='auto': best AIC across families);
        ``refine=True`` then maximizes the log-likelihood over theta."""
        from corrla_rs_tpu.ops import vine as _v

        x = jnp.asarray(samples)
        n, d = x.shape
        if d != 2:
            raise ValueError(f"BivariateCopula needs (n, 2) samples, got {x.shape}")
        order = jnp.argsort(x, axis=0)
        ranks = jnp.zeros_like(order).at[
            order, jnp.arange(d)[None, :]
        ].set(jnp.arange(n)[:, None])
        u = (ranks + 0.5) / n
        if self.family == "auto":
            fam, theta, tau = _v._fit_pair(u[:, 0], u[:, 1],
                                           refine=self.refine)
        else:
            tau = float(_v.kendall_tau(u[:, 0], u[:, 1]))
            fam = self.family
            if not _v._family_admissible(fam, tau):
                hint = (
                    "a 90/270 rotation (e.g. 'clayton90'), 'frank', "
                    "'gaussian' or 'auto'" if tau <= 0.0 else
                    "the unrotated family or a 180 rotation, or 'auto'"
                )
                raise ValueError(
                    f"{fam} copula cannot represent dependence of this "
                    f"sign (tau={tau:.3f}); use {hint}"
                )
            theta = _v._theta_from_tau(fam, tau)
            if self.refine and fam != "independent":
                theta = float(_v._mle_refine_kernel(
                    u[:, 0], u[:, 1], jnp.asarray(float(theta)), fam
                )[0])
        self.fitted_family, self.theta, self.tau = fam, theta, tau
        self._marginals = jnp.sort(x, axis=0)
        self.n = n
        return self

    def logpdf_uniform(self, u, v):
        """Copula log-density at uniform coordinates (u, v)."""
        from corrla_rs_tpu.ops import vine as _v

        return _v._LOGPDF[self.fitted_family](
            _v._clip_u(jnp.asarray(u)), _v._clip_u(jnp.asarray(v)), self.theta
        )

    def sample_uniform(self, n_samples: int, key=0) -> jnp.ndarray:
        """(n, 2) uniform-marginal draws via the inverse h-function."""
        from corrla_rs_tpu.ops import vine as _v

        w = jax.random.uniform(
            as_key(key), (n_samples, 2),
            minval=1e-6, maxval=1.0 - 1e-6,
        )
        v = w[:, 0]
        u = _v._HINV[self.fitted_family](w[:, 1], v, self.theta)
        return jnp.stack([_v._clip_u(u), v], axis=1)

    def sample(self, n_samples: int, key=0) -> jnp.ndarray:
        """(n, 2) draws with the fitted empirical marginals."""
        uu = self.sample_uniform(n_samples, key=key)
        uu = jnp.clip(uu, 0.5 / self.n, 1.0 - 0.5 / self.n)
        grid = (jnp.arange(self.n) + 0.5) / self.n
        cols = [
            jnp.interp(uu[:, j], grid, self._marginals[:, j])
            for j in range(2)
        ]
        return jnp.stack(cols, axis=1)
