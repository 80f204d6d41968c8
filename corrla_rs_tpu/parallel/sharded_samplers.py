"""Multi-chip DEMC: chain population sharded over the mesh.

Each DEMC proposal reads the heads of two random *other* chains
(space_samplers.rs:326-347), so chains can't advance independently: per
step the (n_chains, ndim) head block — tiny — is ``all_gather``-ed over
ICI while histories stay sharded. This is the SURVEY.md §2.2 row-3 design:
"chains sharded with all_gather of head states per step".

Statistically identical to ops.samplers.demc_run (same proposal/accept
math); RNG streams differ only in key-split layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from corrla_rs_tpu.ops.samplers import _pick_two_others
from corrla_rs_tpu.parallel.mesh import CHAINS_AXIS, make_mesh
from corrla_rs_tpu.utils.prng import as_key

__all__ = ["demc_run_sharded", "dream_run_sharded"]


@functools.partial(
    jax.jit,
    static_argnames=("ln_prob_fn", "n_steps", "prop_fixup_fn", "mesh",
                     "axis_name"),
)
def _demc_sharded_jit(heads, ln_prob_fn, n_steps, gamma, var_epsilon, key,
                      prop_fixup_fn, mesh, axis_name):
    n_chains, ndim = heads.shape
    n_dev = mesh.shape[axis_name]
    n_local = n_chains // n_dev

    def kernel(heads_l, key):
        my_shard = lax.axis_index(axis_name)
        offset = my_shard * n_local
        lnp_l = jax.vmap(ln_prob_fn)(heads_l)

        def step(carry, step_key):
            heads_l, lnp_l, n_acc = carry
            all_heads = lax.all_gather(heads_l, axis_name, tiled=True)
            chain_keys = jax.random.split(step_key, n_chains)
            local_keys = lax.dynamic_slice_in_dim(
                chain_keys, offset, n_local
            )

            def one_chain(c_global, ck, x_cur, lnp_cur):
                k_pick, k_jit, k_acc = jax.random.split(ck, 3)
                a, b = _pick_two_others(k_pick, c_global, n_chains)
                delta = all_heads[a] - all_heads[b]
                jitter = jax.random.uniform(
                    k_jit, (ndim,), x_cur.dtype, 0.0, var_epsilon
                )
                prop = x_cur + gamma * delta + jitter
                if prop_fixup_fn is not None:
                    prop = prop_fixup_fn(prop)
                lnp_prop = ln_prob_fn(prop)
                alpha = jnp.exp(jnp.minimum(lnp_prop - lnp_cur, 0.0))
                alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
                accept = jax.random.uniform(k_acc, (), x_cur.dtype) < alpha
                return (
                    jnp.where(accept, prop, x_cur),
                    jnp.where(accept, lnp_prop, lnp_cur),
                    accept,
                )

            c_globals = offset + jnp.arange(n_local)
            xs, lnps, accepts = jax.vmap(one_chain)(
                c_globals, local_keys, heads_l, lnp_l
            )
            n_acc = n_acc + jnp.sum(accepts, dtype=jnp.int32)
            return (xs, lnps, n_acc), xs

        step_keys = jax.random.split(key, n_steps)
        # the accept counter becomes device-varying inside the scan body;
        # mark the init value varying over the chains axis to match
        n_acc0 = lax.pcast(jnp.zeros((), jnp.int32), (axis_name,), to="varying")
        (heads_l, _lnp_l, n_acc), hist_l = lax.scan(
            step, (heads_l, lnp_l, n_acc0), step_keys,
            unroll=min(4, max(n_steps, 1)),
        )
        n_acc_total = lax.psum(n_acc, axis_name)
        return hist_l, heads_l, n_acc_total

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(None, axis_name, None), P(axis_name, None), P()),
    )(heads, key)


@functools.partial(
    jax.jit,
    static_argnames=("ln_prob_fn", "n_steps", "delta_max", "n_cr",
                     "prop_fixup_fn", "n_adapt", "mesh", "axis_name"),
)
def _dream_sharded_jit(heads, ln_prob_fn, n_steps, key, delta_max, n_cr,
                       gamma_jump_prob, b, b_star, n_adapt, prop_fixup_fn,
                       mesh, axis_name):
    from corrla_rs_tpu.ops.samplers import pick_others_batched as _pick

    n_chains, d = heads.shape
    n_dev = mesh.shape[axis_name]
    n_local = n_chains // n_dev

    def kernel(heads_l, key):
        my_shard = lax.axis_index(axis_name)
        offset = my_shard * n_local
        lnp_l = jax.vmap(ln_prob_fn)(heads_l)
        dtype = heads_l.dtype
        p_cr0 = lax.pcast(jnp.ones((n_cr,), dtype) / n_cr, (axis_name,), to="varying")
        stats0 = lax.pcast(jnp.zeros((n_cr,), dtype), (axis_name,), to="varying")
        acc0 = lax.pcast(jnp.zeros((), jnp.int32), (axis_name,), to="varying")
        t0 = lax.pcast(jnp.zeros((), jnp.int32), (axis_name,), to="varying")

        def step(carry, step_key):
            heads_l, lnp_l, p_cr, jump_dist, n_id, n_acc, t = carry
            all_heads = lax.all_gather(heads_l, axis_name, tiled=True)
            chain_std = jnp.std(all_heads, axis=0) + 1e-30

            ks = jax.random.split(step_key, 10)
            # global batched draws; every shard computes the full-population
            # randomness identically (replicated keys) and slices its rows —
            # keeps the proposal distribution identical to the single-chip
            # dream_run generation
            pairs = _pick(ks[1], n_chains, 2 * delta_max)
            delta = jax.random.randint(ks[2], (n_chains,), 1, delta_max + 1)
            cr_ids = jax.random.categorical(
                ks[3], jnp.log(p_cr), shape=(n_chains,)
            )
            z = jax.random.uniform(ks[4], (n_chains, d), dtype)
            force = jax.random.randint(ks[5], (n_chains,), 0, d)
            unit_jump = (
                jax.random.uniform(ks[6], (n_chains,), dtype) < gamma_jump_prob
            )
            e = jax.random.uniform(ks[7], (n_chains, d), dtype, -b, b)
            eps = b_star * jax.random.normal(ks[8], (n_chains, d), dtype)
            u_acc = jax.random.uniform(ks[9], (n_chains,), dtype)

            sl = lambda a: lax.dynamic_slice_in_dim(a, offset, n_local)
            pair_mask = (
                jnp.arange(delta_max)[None, :] < sl(delta)[:, None]
            ).astype(dtype)[..., None]
            a_idx = sl(pairs)[:, :delta_max]
            b_idx = sl(pairs)[:, delta_max:]
            diff = jnp.sum(
                (all_heads[a_idx] - all_heads[b_idx]) * pair_mask, axis=1
            )
            cr_l = sl(cr_ids)
            cr = (cr_l.astype(dtype) + 1.0) / n_cr
            mask = sl(z) < cr[:, None]
            mask = mask.at[jnp.arange(n_local), sl(force)].set(True)
            d_eff = jnp.sum(mask.astype(dtype), axis=1)
            gamma = 2.38 / jnp.sqrt(2.0 * sl(delta).astype(dtype) * d_eff)
            gamma = jnp.where(sl(unit_jump), jnp.asarray(1.0, dtype), gamma)
            step_v = (1.0 + sl(e)) * gamma[:, None] * diff + sl(eps)
            prop = jnp.where(mask, heads_l + step_v, heads_l)
            if prop_fixup_fn is not None:
                prop = jax.vmap(prop_fixup_fn)(prop)
            lnp_prop = jax.vmap(ln_prob_fn)(prop)
            alpha = jnp.exp(jnp.minimum(lnp_prop - lnp_l, 0.0))
            alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
            accepts = sl(u_acc) < alpha
            xs = jnp.where(accepts[:, None], prop, heads_l)
            lnps = jnp.where(accepts, lnp_prop, lnp_l)
            jds = jnp.sum(((xs - heads_l) / chain_std) ** 2, axis=1)

            # crossover adaptation from globally-reduced jump statistics
            jd_add = lax.psum(
                jnp.zeros((n_cr,), dtype).at[cr_l].add(jds), axis_name
            )
            id_add = lax.psum(
                jnp.zeros((n_cr,), dtype).at[cr_l].add(1.0), axis_name
            )
            jump_dist = jump_dist + jd_add
            n_id = n_id + id_add
            mean_jump = jump_dist / jnp.maximum(n_id, 1.0)
            p_new = mean_jump / jnp.maximum(jnp.sum(mean_jump), 1e-30)
            p_new = jnp.maximum(p_new, 0.05 / n_cr)
            p_new = p_new / jnp.sum(p_new)
            p_cr = jnp.where(t < n_adapt, p_new, p_cr)

            n_acc = n_acc + jnp.sum(accepts, dtype=jnp.int32)
            return (xs, lnps, p_cr, jump_dist, n_id, n_acc, t + 1), xs

        step_keys = jax.random.split(key, n_steps)
        (heads_l, _l, _p, _j, _n, n_acc, _t), hist_l = lax.scan(
            step, (heads_l, lnp_l, p_cr0, stats0, stats0, acc0, t0), step_keys,
            unroll=min(4, max(n_steps, 1)),
        )
        return hist_l, heads_l, lax.psum(n_acc, axis_name)

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(None, axis_name, None), P(axis_name, None), P()),
    )(heads, key)


def dream_run_sharded(init_heads, ln_prob_fn, n_steps: int, key=0,
                      delta_max: int = 3, n_cr: int = 3,
                      gamma_jump_prob: float = 0.2, b: float = 0.05,
                      b_star: float = 1e-6, n_adapt: int = 0,
                      prop_fixup_fn=None, mesh=None, axis_name=None):
    """DREAM over a chain-sharded mesh (see ops.dream for the algorithm).

    Heads all_gather per generation; crossover-adaptation statistics are
    psum-reduced so every shard adapts identically. Returns
    (history (n_steps, n_chains, d), final_heads, accept_ratio).
    """
    mesh = mesh or make_mesh(axis_name=CHAINS_AXIS)
    axis_name = axis_name or mesh.axis_names[0]
    heads = jnp.asarray(init_heads)
    n_dev = mesh.shape[axis_name]
    if heads.shape[0] % n_dev != 0:
        raise ValueError(
            f"n_chains ({heads.shape[0]}) must divide mesh axis ({n_dev})"
        )
    assert heads.shape[0] >= 2 * delta_max + 1
    heads = jax.device_put(
        heads, jax.sharding.NamedSharding(mesh, P(axis_name, None))
    )
    hist, final_heads, n_acc = _dream_sharded_jit(
        heads, ln_prob_fn, int(n_steps), as_key(key), delta_max, n_cr,
        gamma_jump_prob, b, b_star, n_adapt, prop_fixup_fn, mesh, axis_name,
    )
    accept_ratio = float(n_acc) / (int(n_steps) * heads.shape[0])
    return hist, final_heads, accept_ratio


def demc_run_sharded(init_heads, ln_prob_fn, n_steps: int, gamma: float,
                     var_epsilon: float, key=0, prop_fixup_fn=None,
                     mesh=None, axis_name=None):
    """DEMC over a chain-sharded mesh.

    Returns (history (n_steps, n_chains, ndim), final_heads, accept_ratio).
    n_chains must divide the mesh axis size.
    """
    mesh = mesh or make_mesh(axis_name=CHAINS_AXIS)
    axis_name = axis_name or mesh.axis_names[0]
    heads = jnp.asarray(init_heads)
    n_dev = mesh.shape[axis_name]
    if heads.shape[0] % n_dev != 0:
        raise ValueError(
            f"n_chains ({heads.shape[0]}) must divide mesh axis ({n_dev})"
        )
    heads = jax.device_put(
        heads, jax.sharding.NamedSharding(mesh, P(axis_name, None))
    )
    hist, final_heads, n_acc = _demc_sharded_jit(
        heads, ln_prob_fn, int(n_steps), gamma, var_epsilon, as_key(key),
        prop_fixup_fn, mesh, axis_name,
    )
    accept_ratio = float(n_acc) / (int(n_steps) * heads.shape[0])
    return hist, final_heads, accept_ratio
