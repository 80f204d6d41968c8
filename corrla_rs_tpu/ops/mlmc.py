"""Multilevel Monte Carlo (MLMC) — EXTENSION.

MFMC (ops/multifidelity.py) treats a model hierarchy as control
variates; MLMC (Giles 2008, Acta Numerica 2015) treats it as a
TELESCOPING SUM over refinement levels:

    E[P_L] = E[P_0] + sum_{l=1..L} E[P_l - P_{l-1}],

estimating each correction with COUPLED pairs (same randomness through
both levels). When the correction variance V_l decays with level and
cost C_l grows, the optimal allocation n_l ~ sqrt(V_l / C_l) makes the
total cost O(eps^-2) where plain MC at the finest level costs
O(eps^-2 C_L) — the standard tool for discretized simulations (SDEs,
PDE meshes) with a refinement dial.

This implements the classic two-stage algorithm: pilot pairs estimate
(V_l, C_l-weighted) allocations for a target standard error, then the
main run tops up each level; levels evaluate as ONE batched call per
level (vmap/jit inside the user callables).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.utils.prng import as_key

__all__ = ["MlmcResult", "mlmc_estimate"]


class MlmcResult(NamedTuple):
    mean: float                # the multilevel estimate of E[P_L]
    std_error: float           # estimated standard error
    n_per_level: np.ndarray    # (L+1,) samples actually used
    level_means: np.ndarray    # (L+1,) correction means Y_l
    level_vars: np.ndarray     # (L+1,) correction variances V_l
    total_cost: float          # sum n_l * cost_l


def mlmc_estimate(level_fns: Sequence[Callable], sample_inputs: Callable,
                  costs, target_se: float | None = None,
                  n_pilot: int = 64, n_max: int = 1_000_000,
                  bucket_sizes: bool = True, key=0) -> MlmcResult:
    """Multilevel estimate of E[level_fns[-1](X)].

    level_fns: callables, coarse -> fine; ``level_fns[l](x)`` maps a
        batch (n, d) -> (n,). COUPLING is by common inputs: correction
        l averages P_l(x) - P_{l-1}(x) on the SAME x draws (for SDE-type
        problems encode the common randomness in x, e.g. the Brownian
        increments at the finest resolution, and let each level
        coarsen internally).
    sample_inputs: (key, n) -> (n, d).
    costs: (L+1,) cost per evaluation of each level (the correction at
        level l is charged cost_l + cost_{l-1}).
    target_se: desired standard error (warns if n_max clips the
        allocation below it); with None, ``n_max`` is an APPROXIMATE
        total-cost budget — pilot cost is subtracted before allocating,
        but per-level pilot floors and bucketing may overshoot the
        realized cost by up to ~2x.
    bucket_sizes: round every top-up batch UP to a power of two —
        data-dependent allocations otherwise compile one XLA program
        per distinct batch shape (measured: the dominant wall cost of
        repeated estimates); the extra samples only improve the SE.

    Returns an MlmcResult; unbiased for E[P_L] by the telescoping sum.
    """
    n_levels = len(level_fns)
    if n_levels < 1:
        raise ValueError("need at least one level")
    costs = np.asarray(costs, np.float64)
    if costs.shape[0] != n_levels:
        raise ValueError(f"costs must have {n_levels} entries")
    corr_cost = costs.copy()
    corr_cost[1:] += costs[:-1]           # pairs evaluate two levels
    key = as_key(key)

    def corrections(k, n, lvl):
        x = sample_inputs(k, int(n))
        fine = jnp.ravel(level_fns[lvl](x))
        if lvl == 0:
            return np.asarray(fine, np.float64)
        coarse = jnp.ravel(level_fns[lvl - 1](x))
        return np.asarray(fine - coarse, np.float64)

    # -- pilot --
    keys = jax.random.split(key, 2 * n_levels)
    sums = np.zeros(n_levels)
    sq_sums = np.zeros(n_levels)
    counts = np.zeros(n_levels, np.int64)
    for lvl in range(n_levels):
        y = corrections(keys[lvl], n_pilot, lvl)
        sums[lvl] = y.sum()
        sq_sums[lvl] = (y ** 2).sum()
        counts[lvl] = y.shape[0]
    v = np.maximum(sq_sums / counts - (sums / counts) ** 2, 1e-300)

    # -- optimal allocation: n_l ~ sqrt(V_l / C_l) --
    lam = np.sum(np.sqrt(v * corr_cost))
    if target_se is not None:
        n_opt = np.ceil(lam * np.sqrt(v / corr_cost)
                        / target_se ** 2).astype(np.int64)
        if np.any(n_opt > n_max):
            import warnings

            warnings.warn(
                f"MLMC: optimal allocation {n_opt.max()} exceeds "
                f"n_max={n_max}; the requested target_se will be "
                "missed (raise n_max)", stacklevel=2)
    else:
        # budget mode: spend (n_max - pilot cost) on the allocation;
        # per-level pilot floors and power-of-two bucketing can still
        # overshoot the target by up to ~2x (documented)
        budget = max(float(n_max) - float(np.dot(counts, corr_cost)),
                     0.0)
        n_opt = np.ceil(budget * np.sqrt(v / corr_cost)
                        / lam).astype(np.int64)
    n_opt = np.minimum(np.maximum(n_opt, n_pilot), n_max)

    # -- top-up --
    for lvl in range(n_levels):
        extra = int(n_opt[lvl] - counts[lvl])
        if extra > 0 and bucket_sizes:
            extra = 1 << (extra - 1).bit_length()
        if extra > 0:
            y = corrections(keys[n_levels + lvl], extra, lvl)
            sums[lvl] += y.sum()
            sq_sums[lvl] += (y ** 2).sum()
            counts[lvl] += y.shape[0]

    means = sums / counts
    v = np.maximum(sq_sums / counts - means ** 2, 0.0)
    est = float(means.sum())
    se = float(np.sqrt(np.sum(v / counts)))
    return MlmcResult(
        mean=est, std_error=se, n_per_level=counts,
        level_means=means, level_vars=v,
        total_cost=float(np.dot(counts, corr_cost)),
    )
