"""Small-problem CPU routing: avoid paying accelerator dispatch latency
(and tiny-contraction matmul precision cliffs) on problems that fit in a
few CPU microseconds.

Measured on the attached TPU (BASELINE.md): each dispatch through the
tunnel costs ~31 ms and each device->host fetch ~30-40 ms, so
``rpca`` on the reference's own 10k x 12 benchmark lost to sklearn
(0.078 s vs 0.019 s) despite a ~1000x faster large-matrix path.
Additionally, XLA:TPU silently downgrades HIGHEST-precision matmuls with
tiny contraction dimensions, which cost DMDc ~4 digits on a 20 x 39
fixture (f32 CPU 1.8e-4 abs err vs f32 TPU 0.69 — measured round 3).
Routing sub-threshold problems to the in-process CPU backend fixes both:
jax compiles the identical program for CPU, inputs are committed there,
and every downstream op follows the committed placement.

The routing triggers only when the DEFAULT backend is an accelerator;
on CPU-only hosts it is a no-op. Arrays the caller explicitly committed
to a device are respected (never re-routed). Disable globally with
``CORRLA_SMALL_PATH=0`` or ``set_small_path_threshold(0)``.

Threshold: total input elements < ``1 << 20`` (~1M) routes to CPU. At
the crossover a 1M-element RSVD costs ~10 ms of CPU matmuls — the same
order as one tunnel dispatch; above it the MXU wins quickly. MCMC
samplers use a chain-count threshold instead (``SAMPLER_CHAINS``):
per-generation work is O(chains * ndim) but the fixed ~300 us/generation
dispatch cost dominates below ~2k chains (BASELINE.md throughput curve).
"""
from __future__ import annotations

import os

import numpy as np

__all__ = [
    "small_path_threshold",
    "set_small_path_threshold",
    "maybe_route_small",
    "route_sampler_small",
    "SAMPLER_CHAINS",
]

_DEFAULT_ELEMS = 1 << 20
# below this many chains, a generation is dispatch-bound on the
# accelerator and the whole scan runs faster on CPU (measured crossover
# ~1-2k chains at ndim ~ 3; 512 is the conservative default)
SAMPLER_CHAINS = 512

_threshold = None  # resolved lazily (env override)


def small_path_threshold() -> int:
    """Current element threshold (0 = routing disabled)."""
    global _threshold
    if _threshold is None:
        env = os.environ.get("CORRLA_SMALL_PATH", "")
        if env == "0":
            _threshold = 0
        elif env:
            try:
                _threshold = int(env)
            except ValueError:
                _threshold = _DEFAULT_ELEMS
        else:
            _threshold = _DEFAULT_ELEMS
    return _threshold


def set_small_path_threshold(n_elems: int) -> None:
    """Override the routing threshold (0 disables routing)."""
    global _threshold
    _threshold = int(n_elems)


def _cpu_device():
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def _routable(arrays) -> bool:
    import jax

    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    for a in arrays:
        if isinstance(a, jax.Array) and getattr(a, "committed", False):
            return False  # caller pinned placement explicitly
    return True


def maybe_route_small(*arrays, work_elems: int | None = None):
    """Commit ``arrays`` to the CPU backend when the problem is below the
    dispatch-bound crossover; otherwise return them unchanged.

    work_elems: explicit work-size proxy (defaults to the total element
    count of ``arrays`` — pass e.g. ``chunk_size * ndim`` when the work
    is bigger than the inputs).
    Returns a tuple matching ``arrays``.
    """
    import jax

    thr = small_path_threshold()
    if thr <= 0 or not _routable(arrays):
        return arrays
    if work_elems is None:
        work_elems = sum(int(np.size(a)) for a in arrays)
    if work_elems >= thr:
        return arrays
    cpu = _cpu_device()
    if cpu is None:
        return arrays
    return tuple(jax.device_put(a, cpu) for a in arrays)


def route_sampler_small(*arrays, n_chains: int,
                        max_chains: int | None = None):
    """Sampler variant: route by population size (the per-generation
    dispatch cost dominates small populations regardless of history
    length)."""
    if small_path_threshold() <= 0 or not _routable(arrays):
        return arrays
    lim = SAMPLER_CHAINS if max_chains is None else max_chains
    if n_chains > lim:
        return arrays
    import jax

    cpu = _cpu_device()
    if cpu is None:
        return arrays
    return tuple(jax.device_put(a, cpu) for a in arrays)
