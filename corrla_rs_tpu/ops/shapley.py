"""Shapley effects: variance attribution for DEPENDENT inputs —
EXTENSION.

Sobol' indices (ops/sobol, ops/pce) decompose variance only under
INDEPENDENT inputs; with correlated inputs they double-count or lose
shared variance and need not sum to anything meaningful. Shapley
effects (Owen 2014; Song, Nelson & Staum 2016; Iooss & Prieur 2019)
attribute Var(Y) by the game-theoretic Shapley value of the "variance
explained" cooperative game

    val(S) = Var( E[Y | X_S] ) / Var(Y),

which ALWAYS sums to 1 and splits shared variance fairly between
correlated inputs — the principled sensitivity measure when the inputs
come from the library's copula/vine models or a correlated Gaussian.

Implementation (exact-weight subset enumeration, d <= ~15):
- every subset's val(S) is estimated with a nested conditional Monte
  Carlo (outer draws of X_S, closed-form Gaussian conditional draws of
  the complement, ONE vmapped model evaluation of the whole
  (n_outer * n_inner, d) block per subset);
- Shapley weights |S|!(d-|S|-1)!/d! combine the 2^d values exactly — no
  permutation-sampling noise on top of the MC noise;
- for LINEAR models with Gaussian inputs, ``shapley_effects_linear``
  computes everything in closed form (val(S) = gamma^T Sigma_SS gamma)
  — both a fast exact path and the oracle the MC estimator is tested
  against.
"""
from __future__ import annotations

import itertools
from math import factorial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.utils.prng import as_key

__all__ = ["shapley_effects", "shapley_effects_linear"]


def _subset_val_linear(beta, cov, s_idx):
    """Exact val(S) = Var(E[Y|X_S]) for linear y = beta^T x, Gaussian x:
    E[Y|X_S] is linear in x_S with coefficients
    gamma = beta_S + Sigma_SS^-1 Sigma_S,Sc beta_Sc."""
    if len(s_idx) == 0:
        return 0.0
    d = beta.shape[0]
    sc = [j for j in range(d) if j not in s_idx]
    s = np.asarray(s_idx)
    css = cov[np.ix_(s, s)]
    if sc:
        csc = cov[np.ix_(s, np.asarray(sc))]
        gamma = beta[s] + np.linalg.solve(css, csc @ beta[np.asarray(sc)])
    else:
        gamma = beta[s]
    return float(gamma @ css @ gamma)


def _combine_shapley(vals: dict, d: int) -> np.ndarray:
    """Exact Shapley combination of subset values: sum over subsets of
    |S|!(d-|S|-1)!/d! increments, normalized by val(full set)."""
    var_y = max(vals[tuple(range(d))], 1e-300)
    sh = np.zeros(d)
    fact_d = factorial(d)
    for s, v in vals.items():
        for i in range(d):
            if i in s:
                continue
            s_with = tuple(sorted(s + (i,)))
            w = factorial(len(s)) * factorial(d - len(s) - 1) / fact_d
            sh[i] += w * (vals[s_with] - v)
    return sh / var_y


def shapley_effects_linear(beta, cov) -> np.ndarray:
    """Closed-form Shapley effects of y = beta^T x, x ~ N(mu, cov):
    (d,) nonnegative, summing to 1."""
    beta = np.asarray(beta, np.float64)
    cov = np.asarray(cov, np.float64)
    d = beta.shape[0]
    vals = {}
    for r in range(d + 1):
        for s in itertools.combinations(range(d), r):
            vals[s] = _subset_val_linear(beta, cov, list(s))
    return _combine_shapley(vals, d)


def _conditional_factors(cov, s_idx, d):
    """Gaussian conditional of the complement given x_S: returns
    (sc, reg (|sc|, |s|), chol (|sc|, |sc|)) with
    x_sc | x_s ~ N(mu_sc + reg (x_s - mu_s), chol chol^T)."""
    sc = [j for j in range(d) if j not in s_idx]
    s = np.asarray(s_idx, int)
    scn = np.asarray(sc, int)
    css = cov[np.ix_(s, s)]
    csc_s = cov[np.ix_(scn, s)]
    reg = np.linalg.solve(css, csc_s.T).T
    cc = cov[np.ix_(scn, scn)] - reg @ csc_s.T
    cc = 0.5 * (cc + cc.T) + 1e-12 * np.eye(len(sc))
    return scn, reg, np.linalg.cholesky(cc)


def shapley_effects(model: Callable, mean, cov, n_outer: int = 128,
                    n_inner: int = 64, key=0,
                    batch_model: bool = True) -> jnp.ndarray:
    """Monte Carlo Shapley effects of ``model`` under x ~ N(mean, cov).

    model: (n, d) -> (n,) batched callable when ``batch_model`` (vmap a
    scalar model yourself otherwise). Cost: 2^d subset evaluations of
    an (n_outer * n_inner)-point batch — exact Shapley weights, the
    only noise is the per-subset conditional MC. d <= ~15.

    For NON-Gaussian dependent inputs, transform through the library's
    copula/vine models: fit the dependence, map the physical inputs to
    correlated Gaussians (inverse-Rosenblatt), and attribute there.
    """
    mean = np.asarray(mean, np.float64)
    cov = np.asarray(cov, np.float64)
    d = mean.shape[0]
    if d > 15:
        raise ValueError(f"subset enumeration is 2^d; d={d} is too large")
    key = as_key(key)
    k_outer, k_inner = jax.random.split(key)
    # shared outer draws of the FULL vector (subset marginals come from
    # the joint by projection — variance-reduction through common
    # random numbers across subsets)
    z_out = np.asarray(jax.random.normal(k_outer, (n_outer, d)))
    chol_full = np.linalg.cholesky(cov + 1e-12 * np.eye(d))
    x_out = mean + z_out @ chol_full.T
    z_in = np.asarray(jax.random.normal(k_inner, (n_outer, n_inner, d)))

    def val_of(s_idx):
        if len(s_idx) == 0:
            return 0.0
        if len(s_idx) == d:
            y = np.asarray(model(jnp.asarray(x_out)))
            return float(np.var(y))
        scn, reg, chol_c = _conditional_factors(cov, s_idx, d)
        s = np.asarray(s_idx, int)
        xs = x_out[:, s]                                  # (no, |s|)
        mu_c = mean[scn] + (xs - mean[s]) @ reg.T         # (no, |sc|)
        draws = mu_c[:, None, :] + z_in[:, :, : len(scn)] @ chol_c.T
        x_full = np.empty((n_outer, n_inner, d))
        x_full[:, :, s] = xs[:, None, :]
        x_full[:, :, scn] = draws
        y = np.asarray(model(jnp.asarray(x_full.reshape(-1, d))))
        yy = y.reshape(n_outer, n_inner)
        cond_mean = yy.mean(axis=1)
        # variance of an n_inner-sample mean is inflated by
        # E[Var(Y|X_S)]/n_inner; subtract the standard correction
        # (Song-Nelson-Staum) — zero extra model evaluations
        within = yy.var(axis=1, ddof=1).mean()
        return float(max(np.var(cond_mean) - within / n_inner, 0.0))

    vals = {}
    for r in range(d + 1):
        for s in itertools.combinations(range(d), r):
            vals[s] = val_of(list(s))
    return jnp.asarray(_combine_shapley(vals, d))
