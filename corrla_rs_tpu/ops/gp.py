"""Gaussian-process regression (extension).

The reference README lists GP regression as a TODO it never implemented
(readme.md:34; SURVEY.md §2.4 item 5). This module completes that roadmap
item TPU-natively: exact GP with RBF / Matern-5/2 kernels, Cholesky solves
on the MXU, and marginal-likelihood hyperparameter optimization with exact
``jax.grad`` gradients (BFGS in log-parameter space).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.scipy.optimize import minimize as _jsp_minimize

from corrla_rs_tpu.ops.interp import pairwise_dists
from corrla_rs_tpu.ops.mat_utils import PRECISION

__all__ = ["GpRegressor", "gp_kernel_eval"]

_LOG_2PI = math.log(2.0 * math.pi)


def gp_kernel_eval(r: jnp.ndarray, kernel: str, length_scale, signal_var):
    """Stationary covariance k(r) for distance matrix r."""
    s = r / length_scale
    if kernel == "rbf":
        return signal_var * jnp.exp(-0.5 * s * s)
    if kernel == "matern52":
        c = jnp.sqrt(5.0) * s
        return signal_var * (1.0 + c + c * c / 3.0) * jnp.exp(-c)
    if kernel == "matern32":
        c = jnp.sqrt(3.0) * s
        return signal_var * (1.0 + c) * jnp.exp(-c)
    raise ValueError(f"unknown GP kernel: {kernel!r}")


def _jitter(dtype):
    # f32 Cholesky needs a larger floor: a near-noise-free MLE solution
    # leaves K within f32 rounding of singular (observed NaN on TPU)
    return 1e-4 if dtype == jnp.float32 else 1e-6


@functools.partial(jax.jit, static_argnames=("kernel",))
def _nlml(log_params, x, y, kernel):
    """Negative log marginal likelihood in log-parameter space."""
    ls, sv, nv = jnp.exp(log_params)
    n = x.shape[0]
    k = gp_kernel_eval(pairwise_dists(x, x), kernel, ls, sv)
    k = k + (nv + _jitter(x.dtype) * sv) * jnp.eye(n, dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    data_fit = 0.5 * jnp.sum(y * alpha)
    log_det = jnp.sum(jnp.log(jnp.diagonal(chol)))
    return (data_fit + log_det + 0.5 * n * _LOG_2PI) / n


@functools.partial(jax.jit, static_argnames=("kernel",))
def _gp_fit(x, y, log_params, kernel):
    ls, sv, nv = jnp.exp(log_params)
    n = x.shape[0]
    k = gp_kernel_eval(pairwise_dists(x, x), kernel, ls, sv)
    k = k + (nv + _jitter(x.dtype) * sv) * jnp.eye(n, dtype=x.dtype)
    chol = jnp.linalg.cholesky(k)
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    return chol, alpha


@functools.partial(jax.jit, static_argnames=("kernel",))
def _gp_predict(x_train, chol, alpha, log_params, xq, kernel):
    ls, sv, _nv = jnp.exp(log_params)
    k_q = gp_kernel_eval(pairwise_dists(xq, x_train), kernel, ls, sv)
    mean = jnp.matmul(k_q, alpha, precision=PRECISION)
    v = jax.scipy.linalg.solve_triangular(chol, k_q.T, lower=True)
    var = sv - jnp.sum(v * v, axis=0)
    return mean, jnp.maximum(var, 0.0)


class GpRegressor:
    """Exact GP regression with optional hyperparameter MLE.

    y is centered internally. predict returns (mean, var) with var the
    latent-function variance (add ``noise_var`` for observation variance).
    """

    def __init__(self, kernel: str = "rbf", length_scale: float = 1.0,
                 signal_var: float = 1.0, noise_var: float = 1e-4):
        self.kernel = kernel
        self.length_scale = float(length_scale)
        self.signal_var = float(signal_var)
        self.noise_var = float(noise_var)
        self.x_train = None

    def _log_params(self):
        return jnp.log(jnp.asarray(
            [self.length_scale, self.signal_var, self.noise_var]
        ))

    def fit(self, x, y, optimize_hypers: bool = True):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if y.ndim == 2:
            y = y[:, 0]
        self._y_mean = jnp.mean(y)
        yc = y - self._y_mean
        if optimize_hypers:
            res = _jsp_minimize(
                lambda lp: _nlml(lp, x, yc, self.kernel),
                self._log_params(), method="BFGS",
            )
            good = jnp.all(jnp.isfinite(res.x))
            lp = jnp.where(good, res.x, self._log_params())
            self.length_scale, self.signal_var, self.noise_var = (
                float(v) for v in jnp.exp(lp)
            )
        self.x_train = x
        self._yc = yc
        self._chol, self._alpha = _gp_fit(x, yc, self._log_params(),
                                          self.kernel)
        return self

    def predict(self, xq, return_var: bool = True):
        xq = jnp.asarray(xq)
        mean, var = _gp_predict(
            self.x_train, self._chol, self._alpha, self._log_params(), xq,
            self.kernel,
        )
        mean = mean + self._y_mean
        return (mean, var) if return_var else mean

    def log_marginal_likelihood(self) -> float:
        n = self.x_train.shape[0]
        return -float(_nlml(self._log_params(), self.x_train, self._yc,
                            self.kernel)) * n
