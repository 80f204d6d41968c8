"""Optimizers for maximum-likelihood fitting.

Replaces the reference's argmin-crate solver zoo (univariate_rv.rs:24-99):
method 0 = gradient descent with backtracking line search (SteepestDescent
parity), 1 = particle swarm, 2 = BFGS (replacing argmin LBFGS). Two strict
improvements over the reference:

- gradients are exact ``jax.grad`` instead of forward finite differences
  (univariate_rv.rs:136-154),
- the particle swarm polishes its best particle with a BFGS descent, so
  method 1 reaches the reference's argmin-PSO accuracy reliably.

The quadratic out-of-bounds penalty matches OptMleProblem::cost
(univariate_rv.rs:126-135). ``mlefit_ps_fallback`` retries a failed fit
with particle swarm (univariate_rv.rs:87-99).

Everything is pure-jnp under jit: the swarm is a vmapped population inside
``lax.fori_loop``; BFGS is ``jax.scipy.optimize.minimize``.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.optimize import minimize as _jsp_minimize

from corrla_rs_tpu.utils.log import get_logger
from corrla_rs_tpu.utils.prng import as_key

__all__ = ["penalized_cost", "mlefit", "mlefit_ps_fallback", "particle_swarm"]


def penalized_cost(cost_fn: Callable, p_bounds) -> Callable:
    """cost + 10 * sum(min(p-lb,0)^2 + max(p-ub,0)^2). univariate_rv.rs:126-135."""
    lb = jnp.asarray(p_bounds[0], dtype=jnp.result_type(float))
    ub = jnp.asarray(p_bounds[1], dtype=jnp.result_type(float))

    def cost(p):
        pen = 10.0 * jnp.sum(jnp.minimum(p - lb, 0.0) ** 2)
        pen = pen + 10.0 * jnp.sum(jnp.maximum(p - ub, 0.0) ** 2)
        return cost_fn(p) + pen

    return cost


def _steepest_descent(cost, p0, max_iters=40, n_backtrack=20):
    """Gradient descent with backtracking Armijo line search."""
    grad = jax.grad(cost)

    def body(_, state):
        p, f = state
        g = grad(p)

        def ls_body(j, carry):
            p_best, f_best, done = carry
            step = 1.0 * 0.5**j
            p_try = p - step * g
            f_try = cost(p_try)
            better = (f_try < f) & ~done
            return (
                jnp.where(better, p_try, p_best),
                jnp.where(better, f_try, f_best),
                done | better,
            )

        p_new, f_new, _ = lax.fori_loop(
            0, n_backtrack, ls_body, (p, f, jnp.array(False))
        )
        return p_new, f_new

    p, _f = lax.fori_loop(0, max_iters, body, (p0, cost(p0)))
    return p


@functools.partial(
    jax.jit, static_argnames=("cost", "n_particles", "n_iters", "polish")
)
def particle_swarm(cost: Callable, p_bounds, key, n_particles: int = 40,
                   n_iters: int = 100, polish: bool = True):
    """Global-ish PSO over a box, vmapped population, lax.fori_loop steps.

    Standard constriction coefficients (w=0.7298, c1=c2=1.4962). With
    ``polish`` a BFGS descent from the swarm best follows (improvement over
    the reference's bare argmin ParticleSwarm, univariate_rv.rs:43-60).
    """
    lb = jnp.asarray(p_bounds[0], dtype=jnp.result_type(float))
    ub = jnp.asarray(p_bounds[1], dtype=jnp.result_type(float))
    d = lb.shape[0]
    k_init, k_vel, k_loop = jax.random.split(as_key(key), 3)
    x0 = jax.random.uniform(k_init, (n_particles, d), lb.dtype) * (ub - lb) + lb
    v0 = jnp.zeros_like(x0)
    f0 = jax.vmap(cost)(x0)
    pbest0, pf0 = x0, f0
    g_idx = jnp.argmin(f0)

    w, c1, c2 = 0.7298, 1.4962, 1.4962

    def body(i, state):
        x, v, pbest, pf, gbest, gf, key = state
        key, k1, k2 = jax.random.split(key, 3)
        r1 = jax.random.uniform(k1, x.shape, x.dtype)
        r2 = jax.random.uniform(k2, x.shape, x.dtype)
        v = w * v + c1 * r1 * (pbest - x) + c2 * r2 * (gbest[None, :] - x)
        x = jnp.clip(x + v, lb, ub)
        f = jax.vmap(cost)(x)
        improved = f < pf
        pbest = jnp.where(improved[:, None], x, pbest)
        pf = jnp.where(improved, f, pf)
        b = jnp.argmin(pf)
        gbest = jnp.where(pf[b] < gf, pbest[b], gbest)
        gf = jnp.minimum(pf[b], gf)
        return x, v, pbest, pf, gbest, gf, key

    state = (x0, v0, pbest0, pf0, x0[g_idx], f0[g_idx], k_loop)
    *_rest, gbest, gf, _key = lax.fori_loop(0, n_iters, body, state)

    if polish:
        res = _jsp_minimize(cost, gbest, method="BFGS")
        better = jnp.isfinite(res.fun) & (res.fun < gf)
        gbest = jnp.where(better, res.x, gbest)
    return gbest


def mlefit(cost_fn: Callable, p_init, p_bounds, method: int = 2, key=0):
    """Minimize a (penalized) cost. Parity with mlefit dispatch
    (univariate_rv.rs:24-83): 0=SteepestDescent, 1=ParticleSwarm, 2=BFGS."""
    cost = penalized_cost(cost_fn, p_bounds)
    p0 = jnp.asarray(p_init, dtype=jnp.result_type(float))
    if method == 0:
        return _steepest_descent(cost, p0)
    if method == 1:
        return particle_swarm(cost, p_bounds, key)
    if method == 2:
        res = _jsp_minimize(cost, p0, method="BFGS")
        return res.x
    raise ValueError("Supply valid method: 0=SD, 1=PS, 2=BFGS")


def mlefit_ps_fallback(cost_fn: Callable, p_init, p_bounds, method: int = 2,
                       key=0):
    """mlefit with particle-swarm retry on failure (non-finite params or
    cost). Parity with univariate_rv.rs:87-99. An invalid ``method`` raises
    (the reference panics, univariate_rv.rs:78-80) rather than silently
    falling back."""
    if method not in (0, 1, 2):
        raise ValueError("Supply valid method: 0=SD, 1=PS, 2=BFGS")
    cost = penalized_cost(cost_fn, p_bounds)
    try:
        p = mlefit(cost_fn, p_init, p_bounds, method, key)
        if bool(jnp.all(jnp.isfinite(p))) and bool(jnp.isfinite(cost(p))):
            return p
    except (FloatingPointError, ValueError, ArithmeticError) as exc:
        # Numeric optimizer failure -> retry with particle swarm (parity
        # with the reference's fallback). Programming errors in the user's
        # cost function (shape mismatches, typos -> TypeError/TracerError/
        # etc.) propagate instead of surfacing as a slow, possibly wrong
        # PS fit.
        get_logger().warning(
            "mlefit(method=%d) failed numerically (%s); retrying with "
            "particle swarm", method, exc,
        )
    return particle_swarm(cost, p_bounds, as_key(key))
