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

__all__ = ["demc_run_sharded"]


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
        n_acc0 = lax.pvary(jnp.zeros((), jnp.int32), (axis_name,))
        (heads_l, _lnp_l, n_acc), hist_l = lax.scan(
            step, (heads_l, lnp_l, n_acc0), step_keys
        )
        n_acc_total = lax.psum(n_acc, axis_name)
        return hist_l, heads_l, n_acc_total

    return jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=(P(None, axis_name, None), P(axis_name, None), P()),
    )(heads, key)


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
