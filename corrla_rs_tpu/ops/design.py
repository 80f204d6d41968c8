"""Space-filling sampling designs (extension).

The reference README's "Space Sampling Methods" section lists the
constrained Dirichlet sampler and "Others TBD" (readme.md:36-39) — these
are the others: the standard experiment-design generators that feed
surrogate fitting (GP/RBF/POD), sensitivity analysis (ops/sobol,
ops/morris) and active-subspace studies.

- ``latin_hypercube``: stratified LHS, pure ``jax.random`` (one
  permutation + one uniform per dimension), optionally maximin-improved
  by taking the best of ``n_candidates`` designs by minimum pairwise
  distance — all candidates generated and scored in one vmapped batch.
- ``sobol_sample``: scrambled Sobol' low-discrepancy points via
  scipy.stats.qmc (host setup work, like ops/sobol's plan).
- ``halton_sample``: scrambled Halton points, same pattern.

All return points in the user's box, (n, d).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.utils.prng import as_key

__all__ = ["latin_hypercube", "sobol_sample", "halton_sample"]


def _box(bounds):
    """(d, lo, span) from a (d, 2) bounds array — the single
    bounds-parsing helper shared by ops/sobol and ops/morris too."""
    bounds = np.asarray(bounds, dtype=np.float64)
    lo = jnp.asarray(bounds[:, 0])
    span = jnp.asarray(bounds[:, 1] - bounds[:, 0])
    return bounds.shape[0], lo, span


def _seed_from_key(key) -> int:
    """Derive a scipy.qmc integer seed from a jax PRNG key.

    Folds EVERY 32-bit word of the key data into the seed (distinct keys
    sharing a word must not produce identical Sobol/Halton plans).
    """
    words = np.asarray(jax.random.key_data(as_key(key))).ravel()
    return int.from_bytes(words.astype(np.uint32).tobytes(), "little") % (
        2**63
    )


def latin_hypercube(bounds, n_samples: int, key=0, n_candidates: int = 1):
    """Latin hypercube sample over a box: every 1-D projection hits every
    one of the ``n_samples`` strata exactly once.

    n_candidates > 1 draws that many independent LHS designs in one
    vmapped batch and keeps the one with the largest minimum pairwise
    distance (maximin criterion) — a cheap, fully on-device improvement
    over a single draw.
    """
    d, lo, span = _box(bounds)
    n = int(n_samples)

    def one(k):
        kp, ku = jax.random.split(k)
        perms = jax.vmap(
            lambda kk: jax.random.permutation(kk, n)
        )(jax.random.split(kp, d))                    # (d, n)
        u = jax.random.uniform(ku, (d, n))
        return ((perms + u) / n).T                    # (n, d) in [0,1)

    if n_candidates <= 1:
        unit = one(as_key(key))
    else:
        cands = jax.vmap(one)(
            jax.random.split(as_key(key), int(n_candidates))
        )                                             # (c, n, d)

        def min_dist(pts):
            d2 = jnp.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
            # mask the diagonal with where, NOT `+ eye*inf` (0*inf = NaN
            # off-diagonal, which poisons every score)
            d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
            return jnp.min(d2)

        scores = jax.vmap(min_dist)(cands)
        unit = cands[jnp.argmax(scores)]
    return lo + unit * span


def sobol_sample(bounds, n_samples: int, key=0):
    """Scrambled Sobol' low-discrepancy points in the box (host-generated
    plan via scipy.stats.qmc, like ops/sobol's sampling plans)."""
    from scipy.stats import qmc

    d, lo, span = _box(bounds)
    u = qmc.Sobol(d, scramble=True, seed=_seed_from_key(key)).random(
        int(n_samples))
    return lo + jnp.asarray(u) * span


def halton_sample(bounds, n_samples: int, key=0):
    """Scrambled Halton low-discrepancy points in the box."""
    from scipy.stats import qmc

    d, lo, span = _box(bounds)
    u = qmc.Halton(d, scramble=True, seed=_seed_from_key(key)).random(
        int(n_samples))
    return lo + jnp.asarray(u) * span
