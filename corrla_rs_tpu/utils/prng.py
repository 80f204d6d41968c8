"""Explicit PRNG-key plumbing.

The reference uses unseedable ``rand::thread_rng()`` everywhere (e.g.
reference mat_utils.rs:171, space_samplers.rs:31). The rebuild threads
explicit ``jax.random`` keys through every stochastic API; a plain int seed
is accepted anywhere a key is, for convenience at the Python surface.
"""
from __future__ import annotations

import jax


def _key_from_int(seed: int) -> jax.Array:
    """Build a typed key from a concrete int WITHOUT touching the default
    accelerator: key construction is host-trivial, but as a device op it
    costs a full dispatch round-trip (~31 ms through the axon tunnel —
    measured dominating small CPU-routed fits). The key is created on the
    in-process CPU backend, uncommitted, and migrates with first use.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.random.key(seed)
    with jax.default_device(cpu):
        return jax.random.key(seed)


def as_key(seed_or_key) -> jax.Array:
    """Coerce an int seed (concrete or traced) or a PRNG key to a PRNG key."""
    if seed_or_key is None:
        return _key_from_int(0)
    if isinstance(seed_or_key, int):
        return _key_from_int(seed_or_key)
    dtype = getattr(seed_or_key, "dtype", None)
    if dtype is not None and jax.dtypes.issubdtype(dtype, jax.dtypes.prng_key):
        return seed_or_key  # already a typed key
    if dtype is not None and jax.numpy.issubdtype(dtype, jax.numpy.integer):
        if getattr(seed_or_key, "ndim", 0) == 0:
            return jax.random.key(seed_or_key)  # traced/array scalar seed
        return seed_or_key  # legacy raw uint32 key data
    return seed_or_key


def split_key(seed_or_key, n: int = 2):
    """Split a seed-or-key into ``n`` fresh keys.

    Eager splits of concrete keys run on the CPU backend (tiny op; as a
    device dispatch it costs a tunnel round-trip — see _key_from_int).
    Traced keys split wherever the trace runs.
    """
    key = as_key(seed_or_key)
    if isinstance(key, jax.core.Tracer):
        return jax.random.split(key, n)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return jax.random.split(key, n)
    with jax.default_device(cpu):
        return jax.random.split(key, n)
