"""Univariate random variables with MLE fitting and KDE.

Parity with reference univariate_rv.rs:157-497 (``UniRv`` trait + Normal /
Beta / Exponential / KDE + ``build_kde``), rebuilt as vectorized pure-jnp
distributions:

- pdf/cdf/sample accept an optional ``params`` override exactly like the
  trait methods (univariate_rv.rs:161-163);
- ``nll`` is a vectorized log-pdf sum (the reference parallelizes the
  per-sample loop with Rayon, univariate_rv.rs:165-171);
- special functions come from ``jax.scipy.special`` (erf, gammaln,
  betainc) instead of statrs — the Beta pdf is computed in log space, so
  large shape parameters don't overflow like the reference's direct
  ``gamma()`` products (univariate_rv.rs:304);
- MLE uses exact autodiff gradients (see ops.optimize).

``build_kde``'s train/test splits use a fixed 70/30 permutation split per
iteration (static shapes for jit) instead of the reference's per-sample
Bernoulli(0.7) coin (univariate_rv.rs:470-487) — statistically equivalent
bandwidth cross-validation; recorded deviation.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import betainc, erf, gammaln

from corrla_rs_tpu.ops.optimize import mlefit_ps_fallback
from corrla_rs_tpu.utils.prng import as_key

__all__ = ["NormalRv", "BetaRv", "ExponentialRv", "KdeRv", "build_kde"]

_SQRT2 = math.sqrt(2.0)
_SQRT2PI = math.sqrt(2.0 * math.pi)


class _UniRv:
    """Shared NLL + fit plumbing (UniRv default impl, univariate_rv.rs:159-171)."""

    def nll(self, samples, params=None) -> jnp.ndarray:
        x = jnp.asarray(samples)
        return -jnp.sum(jnp.log(self.pdf(x, params)))


class NormalRv(_UniRv):
    """Normal distribution. univariate_rv.rs:175-239."""

    def __init__(self, mu: float, std: float):
        self.mu = mu
        self.std = std

    def _params(self, params):
        if params is None:
            return self.mu, self.std
        return params[0], params[1]

    def pdf(self, x, params=None):
        mu, std = self._params(params)
        std = jnp.abs(std)  # parity: par[1].abs() (univariate_rv.rs:214)
        z = (jnp.asarray(x) - mu) / std
        return jnp.exp(-0.5 * z * z) / (std * _SQRT2PI)

    def cdf(self, x, params=None):
        mu, std = self._params(params)
        return 0.5 * (1.0 + erf((jnp.asarray(x) - mu) / (std * _SQRT2)))

    def sample(self, n_samples: int, params=None, key=0):
        mu, std = self._params(params)
        z = jax.random.normal(as_key(key), (n_samples,),
                              jnp.result_type(float))
        return mu + std * z

    def mlfit(self, samples, method: int | None = 2, key=0):
        """MLE fit; init/bounds parity with univariate_rv.rs:191-207."""
        x = jnp.asarray(samples)
        cost = lambda p: self.nll(x, p)
        p = mlefit_ps_fallback(
            cost, [10.0, 10.0], [[-1000.0, 1e-12], [1000.0, 1000.0]],
            method if method is not None else 2, key,
        )
        self.mu, self.std = float(p[0]), float(abs(p[1]))
        return self


class BetaRv(_UniRv):
    """Beta distribution on [lower_b, upper_b]. univariate_rv.rs:243-329."""

    def __init__(self, alpha: float, beta: float, lower_b: float = 0.0,
                 upper_b: float = 1.0):
        self.alpha = alpha
        self.beta = beta
        self.lower_b = lower_b
        self.upper_b = upper_b

    def _params(self, params):
        if params is None:
            return self.alpha, self.beta
        return params[0], params[1]

    def _scale(self, x):
        return (jnp.asarray(x) - self.lower_b) / (self.upper_b - self.lower_b)

    def pdf(self, x, params=None):
        a, b = self._params(params)
        xs = self._scale(x)
        # log-space Beta pdf (the reference's direct gamma() products
        # overflow past a+b ~ 170, univariate_rv.rs:297-306)
        ln_b = gammaln(a) + gammaln(b) - gammaln(a + b)
        ln_pdf = (a - 1.0) * jnp.log(xs) + (b - 1.0) * jnp.log1p(-xs) - ln_b
        return jnp.exp(ln_pdf)

    def cdf(self, x, params=None):
        a, b = self._params(params)
        return betainc(a, b, self._scale(x))

    def sample(self, n_samples: int, params=None, key=0):
        a, b = self._params(params)
        z = jax.random.beta(as_key(key), a, b, (n_samples,),
                            jnp.result_type(float))
        return z * (self.upper_b - self.lower_b) + self.lower_b

    def mlfit(self, samples, method: int | None = None, key=0):
        """method=None: closed-form method of moments
        (univariate_rv.rs:279-292); otherwise MLE with init [1, 1] and
        bounds [1e-4, 200] (univariate_rv.rs:265-277)."""
        x = jnp.asarray(samples)
        if method is None:
            y_mu = float(jnp.mean(x))
            y_var = float(jnp.var(x, ddof=1))
            a, c = self.lower_b, self.upper_b
            common = a * c - a * y_mu - c * y_mu + y_mu**2 + y_var
            self.alpha = (a - y_mu) * common / (y_var * (c - a))
            self.beta = -(c - y_mu) * common / (y_var * (c - a))
            return self
        cost = lambda p: self.nll(x, p)
        p = mlefit_ps_fallback(
            cost, [1.0, 1.0], [[1e-4, 1e-4], [200.0, 200.0]], method, key
        )
        self.alpha, self.beta = float(p[0]), float(p[1])
        return self


class ExponentialRv(_UniRv):
    """Exponential distribution. univariate_rv.rs:332-382."""

    def __init__(self, lam: float):
        self.lam = lam

    def _params(self, params):
        return self.lam if params is None else params[0]

    def pdf(self, x, params=None):
        lam = self._params(params)
        return lam * jnp.exp(-lam * jnp.asarray(x))

    def cdf(self, x, params=None):
        lam = self._params(params)
        return 1.0 - jnp.exp(-lam * jnp.asarray(x))

    def sample(self, n_samples: int, params=None, key=0):
        lam = self._params(params)
        e = jax.random.exponential(as_key(key), (n_samples,),
                                   jnp.result_type(float))
        return e / lam

    def mlfit(self, samples, method: int | None = 2, key=0):
        """Init/bounds parity with univariate_rv.rs:344-355."""
        x = jnp.asarray(samples)
        cost = lambda p: self.nll(x, p)
        p = mlefit_ps_fallback(
            cost, [1.0], [[1e-12], [100.0]],
            method if method is not None else 2, key,
        )
        self.lam = float(p[0])
        return self


class KdeRv(_UniRv):
    """Gaussian-kernel KDE (the kernel is a fixed standard normal, as in
    the reference — univariate_rv.rs:385-460)."""

    def __init__(self, bandwidth: float, samples):
        self.bandwidth = float(bandwidth)
        self.supports = jnp.asarray(samples)
        n = self.supports.shape[0]
        self.weights = jnp.ones((n,), self.supports.dtype) / n

    def _bw(self, params):
        return self.bandwidth if params is None else params[0]

    def pdf(self, x, params=None):
        bw = self._bw(params)
        x = jnp.atleast_1d(jnp.asarray(x))
        z = (x[:, None] - self.supports[None, :]) / jnp.abs(bw)
        k = jnp.exp(-0.5 * z * z) / (jnp.abs(bw) * _SQRT2PI)
        out = jnp.sum(self.weights[None, :] * k, axis=1)
        return out if out.shape[0] > 1 else out[0]

    def cdf(self, x, params=None):
        bw = self._bw(params)
        x = jnp.atleast_1d(jnp.asarray(x))
        z = (x[:, None] - self.supports[None, :]) / (bw * _SQRT2)
        c = 0.5 * (1.0 + erf(z))
        out = jnp.sum(self.weights[None, :] * c, axis=1)
        return out if out.shape[0] > 1 else out[0]

    def sample(self, n_samples: int, params=None, key=0):
        """Ancestral sampling: random kernel + normal draw
        (univariate_rv.rs:445-459)."""
        bw = self._bw(params)
        k1, k2 = jax.random.split(as_key(key))
        idx = jax.random.randint(k1, (n_samples,), 0, self.supports.shape[0])
        z = jax.random.normal(k2, (n_samples,), jnp.result_type(float))
        return self.supports[idx] + bw * z

    def est_bandwidth(self, test_samples, method: int | None = 2, key=0):
        """MLE bandwidth on held-out samples; init/bounds parity with
        univariate_rv.rs:406-420."""
        x = jnp.asarray(test_samples)
        cost = lambda p: self.nll(x, p)
        p = mlefit_ps_fallback(
            cost, [self.bandwidth], [[1e-9], [1000.0]],
            method if method is not None else 2, key,
        )
        return float(p[0])


def build_kde(init_bandwidth: float, samples, n_iter: int = 10,
              method: int = 2, key=0) -> KdeRv:
    """KDE with cross-validated bandwidth: median over n_iter random 70/30
    train/test splits. Parity with univariate_rv.rs:464-497 (fixed-ratio
    permutation splits instead of per-sample coins — static shapes)."""
    x = jnp.asarray(samples)
    n = x.shape[0]
    n_train = max(int(0.7 * n), 2)
    key = as_key(key)
    bws = []
    for i in range(n_iter):
        key, k_perm, k_fit = jax.random.split(key, 3)
        perm = jax.random.permutation(k_perm, n)
        train = x[perm[:n_train]]
        test = x[perm[n_train:]]
        bw = KdeRv(init_bandwidth, train).est_bandwidth(test, method, k_fit)
        bws.append(bw)
    bws.sort()
    return KdeRv(bws[len(bws) // 2], x)
