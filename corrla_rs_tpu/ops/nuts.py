"""NUTS: the No-U-Turn Sampler, iterative and jit-safe — EXTENSION.

HMC (ops/hmc.py) needs a trajectory length; NUTS (Hoffman & Gelman
2014) removes that last tuning knob by doubling the trajectory until it
starts to turn back on itself, then multinomially sampling a point
proportional to the target density along the trajectory (Betancourt
2017's multinomial scheme, as in Stan/numpyro — not the original
slice-sampler form).

Recursive tree-building does not jit (data-dependent recursion), so
this is the ITERATIVE formulation: a doubling ``while_loop`` (bounded
by ``max_depth``) whose body expands the trajectory by 2^depth leapfrog
steps in a random direction via an inner ``while_loop``, detecting
U-turns inside the new subtree with the standard power-of-two
checkpoint trick — every prefix block of size 2^k is exactly the
recursion's internal node, and a leaf finishing such a block checks
(start-state, end-state, block momentum sum) against fixed-size
``(max_depth, d)`` buffers updated with masked writes. All chains run
the step in one ``vmap``; generations are a ``lax.scan``.

Warmup matches ops/hmc.py: Nesterov dual averaging of the step size to
a target acceptance (the Stan statistic: mean Metropolis ratio over
visited leaves) and diagonal inverse-mass estimation from warmup
second moments.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from corrla_rs_tpu.utils.prng import as_key

__all__ = ["NutsResult", "nuts_run"]

_DELTA_MAX = 1000.0  # Stan's divergence threshold on H - H0


class NutsResult(NamedTuple):
    history: jnp.ndarray      # (n_steps, n_chains, d)
    final: jnp.ndarray        # (n_chains, d)
    accept_ratio: float       # mean leaf Metropolis statistic, post-warmup
    step_size: float
    inv_mass: jnp.ndarray     # (d,)
    n_divergent: int          # post-warmup divergent trajectories
    mean_tree_depth: float    # post-warmup doublings per generation


def _uturn(x_lo, p_lo, x_hi, p_hi, rho, inv_mass):
    """Generalized U-turn criterion (Stan): the segment is turning when
    the momentum at either end points against the segment's total
    momentum in the M^-1 metric: rho^T M^-1 p < 0 (ONE inv_mass
    factor — applying it to both arguments would test in M^-2)."""
    v = rho * inv_mass
    return (jnp.dot(v, p_lo) < 0.0) | (jnp.dot(v, p_hi) < 0.0)


def _nuts_step_factory(ln_prob_fn, max_depth: int):
    grad_fn = jax.grad(ln_prob_fn)

    def hamiltonian(x, p, inv_mass):
        return -ln_prob_fn(x) + 0.5 * jnp.sum(p * p * inv_mass)

    def leapfrog(x, p, g, eps, inv_mass):
        """One step with the gradient carried across leaves (the closing
        half-kick's grad is the next leaf's opening grad — carrying it
        halves the gradient evaluations)."""
        p_half = p + 0.5 * eps * g
        x = x + eps * (p_half * inv_mass)
        g = grad_fn(x)
        p = p_half + 0.5 * eps * g
        return x, p, g

    def build_subtree(key, x0, p0, v_eps, inv_mass, h0, depth, rho_in):
        """Expand 2^depth leapfrog steps from (x0, p0) with step v_eps.

        Returns (x_end, p_end, x_prop, lsw, rho_subtree, turning,
        divergent, sum_alpha, n_alpha). Fixed-size checkpoint buffers
        detect every internal-node U-turn of the recursion.
        """
        d = x0.shape[0]
        n_leaves = jnp.left_shift(jnp.asarray(1, depth.dtype), depth)               # dynamic 2^depth
        ck_x = jnp.zeros((max_depth, d), x0.dtype)
        ck_p = jnp.zeros((max_depth, d), x0.dtype)
        ck_rho0 = jnp.zeros((max_depth, d), x0.dtype)     # rho before block
        levels = jnp.arange(max_depth)

        def cond(st):
            (i, _x, _p, _g, _xp, _lsw, _rho, turning, divergent, _ck, _k,
             _sa, _na) = st
            return (i < n_leaves) & ~turning & ~divergent

        def body(st):
            (i, x, p, g, x_prop, lsw, rho, turning, divergent,
             (ck_x, ck_p, ck_rho0), key, s_alpha, n_alpha) = st
            x, p, g = leapfrog(x, p, g, v_eps, inv_mass)
            # a level-k block starts at leaf i when i % 2^k == 0: its left
            # endpoint is THIS leaf (post-leapfrog) and its momentum sum
            # starts from rho before this leaf is added — matching the
            # recursion's internal-node endpoints exactly
            starts = (i & (jnp.left_shift(jnp.asarray(1, levels.dtype), levels) - 1)) == 0
            starts = starts & (levels <= depth)
            ck_x = jnp.where(starts[:, None], x[None, :], ck_x)
            ck_p = jnp.where(starts[:, None], p[None, :], ck_p)
            ck_rho0 = jnp.where(starts[:, None], rho[None, :], ck_rho0)

            h = hamiltonian(x, p, inv_mass)
            dh = h - h0
            divergent = divergent | ~jnp.isfinite(dh) | (dh > _DELTA_MAX)
            log_w = jnp.where(jnp.isfinite(dh), -dh, -jnp.inf)
            # streaming multinomial proposal within the subtree
            new_lsw = jnp.logaddexp(lsw, log_w)
            key, k_sel = jax.random.split(key)
            take = (jnp.log(jax.random.uniform(k_sel, (), x.dtype))
                    < log_w - new_lsw)
            x_prop = jnp.where(take, x, x_prop)
            lsw = new_lsw
            rho = rho + p
            # acceptance statistic (Stan): mean min(1, exp(-dh)) over leaves
            s_alpha = s_alpha + jnp.exp(jnp.minimum(-dh, 0.0))
            n_alpha = n_alpha + 1.0
            # completed blocks: level k completes when (i+1) % 2^k == 0
            done = ((i + 1) & (jnp.left_shift(jnp.asarray(1, levels.dtype), levels) - 1)) == 0
            done = done & (levels <= depth)
            rho_blk = rho[None, :] - ck_rho0                  # (L, d)
            turn_k = jax.vmap(
                lambda xl, pl, rb: _uturn(xl, pl, x, p, rb, inv_mass)
            )(ck_x, ck_p, rho_blk)
            turning = turning | jnp.any(turn_k & done)
            return (i + 1, x, p, g, x_prop, lsw, rho, turning, divergent,
                    (ck_x, ck_p, ck_rho0), key, s_alpha, n_alpha)

        zero = jnp.zeros((), x0.dtype)
        st0 = (jnp.zeros((), jnp.int32), x0, p0, grad_fn(x0), x0,
               -jnp.inf * (1 + zero),
               rho_in * 0.0, jnp.zeros((), bool), jnp.zeros((), bool),
               (ck_x, ck_p, ck_rho0), key, zero, zero)
        (i, x, p, _g, x_prop, lsw, rho, turning, divergent, _ck, _k,
         s_alpha, n_alpha) = lax.while_loop(cond, body, st0)
        return x, p, x_prop, lsw, rho, turning, divergent, s_alpha, n_alpha

    def nuts_transition(key, x_cur, eps, inv_mass):
        """One NUTS generation for a single chain."""
        d = x_cur.shape[0]
        dtype = x_cur.dtype
        k_mom, k_loop = jax.random.split(key)
        p0 = jax.random.normal(k_mom, (d,), dtype) / jnp.sqrt(inv_mass)
        h0 = hamiltonian(x_cur, p0, inv_mass)

        def cond(st):
            return (st[0] < max_depth) & ~st[1]

        def body(st):
            (depth, _stop, x_l, p_l, x_r, p_r, x_prop, lsw, rho,
             divergent, key, s_a, n_a, _last_depth) = st
            key, k_dir, k_sub, k_acc = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(k_dir)
            x_edge = jnp.where(go_right, x_r, x_l)
            p_edge = jnp.where(go_right, p_r, p_l)
            v_eps = jnp.where(go_right, eps, -eps)
            (x_e, p_e, x_psub, lsw_sub, rho_sub, turn_sub, div_sub,
             s_a2, n_a2) = build_subtree(
                k_sub, x_edge, p_edge, v_eps, inv_mass, h0, depth, rho)
            s_a = s_a + s_a2
            n_a = n_a + n_a2
            x_l = jnp.where(go_right, x_l, x_e)
            p_l = jnp.where(go_right, p_l, p_e)
            x_r = jnp.where(go_right, x_e, x_r)
            p_r = jnp.where(go_right, p_e, p_r)
            ok = ~turn_sub & ~div_sub
            # biased progressive sampling across doublings
            take = (jnp.log(jax.random.uniform(k_acc, (), dtype))
                    < lsw_sub - lsw) & ok
            x_prop = jnp.where(take, x_psub, x_prop)
            lsw = jnp.where(ok, jnp.logaddexp(lsw, lsw_sub), lsw)
            rho = rho + rho_sub
            turning_tree = _uturn(x_l, p_l, x_r, p_r, rho, inv_mass)
            stop = turn_sub | div_sub | turning_tree
            return (depth + 1, stop, x_l, p_l, x_r, p_r, x_prop, lsw,
                    rho, divergent | div_sub, key, s_a, n_a,
                    jnp.where(stop, depth, depth + 1))

        zero = jnp.zeros((), dtype)
        st0 = (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
               x_cur, p0, x_cur, p0, x_cur, zero, p0,
               jnp.zeros((), bool), k_loop, zero, zero,
               jnp.zeros((), jnp.int32))
        (_d, _s, _xl, _pl, _xr, _pr, x_new, _lsw, _rho, divergent, _k,
         s_a, n_a, last_depth) = lax.while_loop(cond, body, st0)
        a_stat = s_a / jnp.maximum(n_a, 1.0)
        return x_new, a_stat, divergent, last_depth

    return nuts_transition


def nuts_run(init_chains, ln_prob_fn: Callable, n_steps: int,
             n_warmup: int = 500, max_depth: int = 8,
             target_accept: float = 0.8, init_step_size: float = 0.1,
             key=0, adapt_mass: bool = True, mesh=None,
             axis_name=None) -> NutsResult:
    """Run NUTS on parallel chains (same contract as ops/hmc.hmc_run,
    minus the trajectory-length knob NUTS exists to remove).

    Multi-chip: chains are INDEPENDENT (the U-turn machinery is
    per-chain), so ``mesh=`` is pure GSPMD chain-data-parallelism like
    ops/hmc.py — zero collectives inside the doubling loops; only the
    scalar dual-averaging statistic, divergence count and warmup
    moments reduce across chains, so the sharded run is statistically
    identical (not bitwise: those reductions reassociate)."""
    x0 = jnp.asarray(init_chains)
    if x0.ndim != 2:
        raise ValueError(f"init_chains must be (n_chains, d), got "
                         f"{x0.shape}")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ax = axis_name or mesh.axis_names[0]
        n_dev = mesh.shape[ax]
        if x0.shape[0] % n_dev != 0:
            raise ValueError(
                f"mesh axis size ({n_dev}) must divide n_chains "
                f"({x0.shape[0]})")
        x0 = jax.device_put(x0, NamedSharding(mesh, P(ax, None)))
    n_chains, d = x0.shape
    dtype = x0.dtype
    key = as_key(key)
    transition = _nuts_step_factory(ln_prob_fn, int(max_depth))
    v_transition = jax.vmap(transition, in_axes=(0, 0, None, None))

    def gen(x, eps, inv_mass, k):
        keys = jax.random.split(k, n_chains)
        x_new, a_stat, divergent, depth = v_transition(keys, x, eps,
                                                       inv_mass)
        return (x_new, jnp.mean(a_stat),
                jnp.sum(divergent, dtype=jnp.int32),
                jnp.mean(depth.astype(dtype)))

    # -- warmup: dual averaging (same constants as ops/hmc.py) --
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def dual_avg_phase(x, keys, eps0, inv_mass):
        mu = jnp.log(10.0) + jnp.log(eps0)

        def warm_body(carry, k):
            x, log_eps, log_eps_bar, h_bar, t = carry
            x, a_stat, _dv, _dp = gen(x, jnp.exp(log_eps), inv_mass, k)
            t = t + 1.0
            h_bar = ((1.0 - 1.0 / (t + t0)) * h_bar
                     + (target_accept - a_stat) / (t + t0))
            log_eps = mu - jnp.sqrt(t) / gamma * h_bar
            w = t ** (-kappa)
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            return (x, log_eps, log_eps_bar, h_bar, t), x

        (x, _, log_eps_bar, _, _), hist = lax.scan(
            warm_body,
            (x, jnp.log(eps0), jnp.log(eps0),
             jnp.zeros((), dtype), jnp.zeros((), dtype)),
            keys,
        )
        return x, jnp.exp(log_eps_bar), hist

    keys_w = jax.random.split(key, int(n_warmup) + 1)
    do_mass = adapt_mass and n_warmup >= 20
    # phase 1 on the unit metric; with mass adaptation, phase 2 RE-ADAPTS
    # eps under the new metric (same rationale as ops/hmc.py)
    n1 = (2 * int(n_warmup)) // 3 if do_mass else int(n_warmup)
    x, eps, warm_hist = dual_avg_phase(
        x0, keys_w[1: n1 + 1], jnp.asarray(init_step_size, dtype),
        jnp.ones((d,), dtype))
    if do_mass:
        tail = warm_hist[n1 // 2:].reshape(-1, d)
        inv_mass = jnp.var(tail, axis=0) + 1e-6
        x, eps, _ = dual_avg_phase(x, keys_w[n1 + 1:], eps, inv_mass)
    else:
        inv_mass = jnp.ones((d,), dtype)

    def samp_body(carry, k):
        x, acc, dv, dp = carry
        x, a_stat, n_dv, depth = gen(x, eps, inv_mass, k)
        return (x, acc + a_stat, dv + n_dv, dp + depth), x

    keys_s = jax.random.split(keys_w[0], int(n_steps))
    (x, acc, dv, dp), hist = lax.scan(
        samp_body,
        (x, jnp.zeros((), dtype), jnp.zeros((), jnp.int32),
         jnp.zeros((), dtype)),
        keys_s,
    )
    return NutsResult(
        history=hist, final=x,
        accept_ratio=float(acc / n_steps),
        step_size=float(eps),
        inv_mass=inv_mass,
        n_divergent=int(dv),
        mean_tree_depth=float(dp / n_steps),
    )
