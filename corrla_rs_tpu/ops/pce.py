"""Polynomial chaos expansion (PCE) surrogates (extension).

The standard UQ surrogate the reference never had: project a model onto
an orthonormal polynomial basis of the inputs (tensorized Legendre for
uniform inputs, probabilists' Hermite for Gaussian), fit the
coefficients by regression, and read statistics ANALYTICALLY off the
coefficients — mean, variance, and every Sobol' index come from sums of
squared coefficients, no pick-freeze re-evaluation needed (Sudret 2008).
Complements ops/sobol (estimator on the true model) and ops/morris
(screening): fit a PCE on a space-filling design (ops/design), then get
the full sensitivity picture for free.

TPU-first shape: the basis matrix is built by dimension-wise recurrence
tables + a product gather over the multi-index set (one (n, P) matrix),
the fit is a single least-squares solve, prediction is one matmul.
Everything jits; the multi-index set is static (computed on host from
``order``/``dim``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops.mat_utils import PRECISION

__all__ = ["PolynomialChaos", "total_degree_multi_indices"]


def total_degree_multi_indices(dim: int, order: int) -> np.ndarray:
    """All multi-indices alpha in N^dim with sum(alpha) <= order,
    graded-lexicographic (constant term first). Shape (P, dim),
    P = C(dim + order, order)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")

    def comps(total, slots):
        # graded compositions, O(P * dim) — a filtered itertools.product
        # would enumerate (total+1)^dim tuples, which hangs by dim ~ 12
        if slots == 1:
            yield (total,)
            return
        for first in range(total + 1):
            for rest in comps(total - first, slots - 1):
                yield (first,) + rest

    idx = [
        alpha
        for total in range(order + 1)
        for alpha in comps(total, dim)
    ]
    return np.asarray(idx, dtype=np.int32)


def _legendre_table(z: jnp.ndarray, order: int) -> jnp.ndarray:
    """Orthonormal Legendre on U(-1, 1): (n, d, order+1).
    P~_k = sqrt(2k+1) P_k; E[P~_j P~_k] = delta_jk under U(-1,1)."""
    polys = [jnp.ones_like(z), z]
    for k in range(1, order):
        polys.append(((2 * k + 1) * z * polys[k] - k * polys[k - 1])
                     / (k + 1))
    scale = jnp.asarray(
        [math.sqrt(2 * k + 1) for k in range(order + 1)], z.dtype
    )
    return jnp.stack(polys[: order + 1], axis=-1) * scale


def _hermite_table(z: jnp.ndarray, order: int) -> jnp.ndarray:
    """Orthonormal probabilists' Hermite on N(0, 1): (n, d, order+1).
    He~_k = He_k / sqrt(k!)."""
    polys = [jnp.ones_like(z), z]
    for k in range(1, order):
        polys.append(z * polys[k] - k * polys[k - 1])
    scale = jnp.asarray(
        [1.0 / math.sqrt(math.factorial(k)) for k in range(order + 1)],
        z.dtype,
    )
    return jnp.stack(polys[: order + 1], axis=-1) * scale


class PolynomialChaos:
    """PCE surrogate with analytic moments and Sobol' indices.

    dist: "uniform" (inputs uniform on the box ``bounds``, Legendre
    basis) or "gaussian" (inputs N(mean, std^2) per dim, Hermite basis —
    pass ``mean``/``std`` arrays or let ``fit`` estimate them).
    order: total polynomial degree. The basis has C(d + order, order)
    terms; keep n_samples >= ~2-3x that for a stable regression fit.
    """

    def __init__(self, order: int, dist: str = "uniform", bounds=None,
                 mean=None, std=None):
        if dist not in ("uniform", "gaussian"):
            raise ValueError(f"dist must be 'uniform'|'gaussian', got {dist!r}")
        if dist == "uniform" and bounds is None:
            raise ValueError("dist='uniform' requires bounds (d, 2)")
        self.order = int(order)
        self.dist = dist
        self.bounds = None if bounds is None else np.asarray(
            bounds, dtype=np.float64
        )
        self._mean = None if mean is None else np.asarray(mean, np.float64)
        self._std = None if std is None else np.asarray(std, np.float64)

    def _standardize(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.dist == "uniform":
            lo = jnp.asarray(self.bounds[:, 0], x.dtype)
            span = jnp.asarray(
                self.bounds[:, 1] - self.bounds[:, 0], x.dtype
            )
            return 2.0 * (x - lo) / span - 1.0
        return (x - jnp.asarray(self._mean, x.dtype)) / jnp.asarray(
            self._std, x.dtype
        )

    def _basis(self, x: jnp.ndarray) -> jnp.ndarray:
        z = self._standardize(x)
        table = (
            _legendre_table(z, self.order) if self.dist == "uniform"
            else _hermite_table(z, self.order)
        )                                           # (n, d, order+1)
        # Psi[:, k] = prod_j table[:, j, alpha_k[j]] — advanced indexing
        # over the last two axes gathers an (n, P, d) block in one op
        alpha = jnp.asarray(self._alpha)            # (P, d)
        d = alpha.shape[1]
        sel = table[:, jnp.arange(d)[None, :], alpha]   # (n, P, d)
        return jnp.prod(sel, axis=-1)               # (n, P)

    def fit(self, x, y):
        """Least-squares PCE fit on (n, d) samples and (n,) responses."""
        x = jnp.asarray(x)
        y = jnp.asarray(y).reshape(-1)
        d = x.shape[1]
        self._alpha = total_degree_multi_indices(d, self.order)
        if self.dist == "gaussian":
            # estimate mean and std INDEPENDENTLY (a user-provided std
            # must survive a None mean, and vice versa)
            if self._mean is None:
                self._mean = np.asarray(jnp.mean(x, axis=0), np.float64)
            if self._std is None:
                self._std = np.asarray(jnp.std(x, axis=0), np.float64)
        psi = self._basis(x)                        # (n, P)
        n, p = psi.shape
        if n < p:
            raise ValueError(
                f"{n} samples cannot determine {p} coefficients "
                f"(order {self.order}, dim {d}); add samples or lower order"
            )
        coeffs, _res, _rk, _sv = jnp.linalg.lstsq(psi, y)
        self.coeffs = coeffs
        # training diagnostics
        y_hat = jnp.matmul(psi, coeffs, precision=PRECISION)
        ss_res = jnp.sum((y - y_hat) ** 2)
        ftype = jnp.result_type(y.dtype, jnp.float32)  # y may be integer
        ss_tot = jnp.maximum(
            jnp.sum((y - jnp.mean(y)) ** 2).astype(ftype),
            jnp.asarray(jnp.finfo(ftype).tiny, ftype),
        )
        self.r2 = float(1.0 - ss_res / ss_tot)
        return self

    def predict(self, xq) -> jnp.ndarray:
        return jnp.matmul(
            self._basis(jnp.asarray(xq)), self.coeffs, precision=PRECISION
        )

    # ---- analytic statistics (orthonormal basis => sums of squares) ----

    @property
    def mean(self) -> float:
        return float(self.coeffs[0])

    @property
    def var(self) -> float:
        return float(jnp.sum(self.coeffs[1:] ** 2))

    def sobol_indices(self):
        """dict with ``s1`` and ``st`` (d,) — exact for the surrogate
        (Sudret 2008): S1_i sums c_k^2 over terms involving ONLY dim i,
        ST_i over all terms involving dim i."""
        alpha = self._alpha                          # (P, d) host
        c2 = np.asarray(self.coeffs) ** 2
        var = max(float(c2[1:].sum()), 1e-300)
        d = alpha.shape[1]
        active = alpha > 0                           # (P, d)
        n_active = active.sum(axis=1)
        s1 = np.array([
            c2[(active[:, i]) & (n_active == 1)].sum() / var
            for i in range(d)
        ])
        st = np.array([c2[active[:, i]].sum() / var for i in range(d)])
        return {"s1": jnp.asarray(s1), "st": jnp.asarray(st)}
