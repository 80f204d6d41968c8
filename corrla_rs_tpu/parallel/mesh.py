"""Device-mesh construction and sharding vocabulary.

This is the rebuild's communication backend (the reference has none — its
only parallelism is single-process Rayon threading, SURVEY.md §2.2). One
module owns:

- mesh construction (`make_mesh`) over ICI (single host) or ICI+DCN
  (multi-host via jax.distributed, handled transparently by jax),
- canonical axis names: ``"rows"`` for sharding the tall/sample dimension
  of data matrices (RSVD/PCA/POD/DMD), ``"chains"`` for sharding MCMC
  chain populations,
- helpers for row-sharded placement of big matrices.

Collectives used by the sharded kernels: ``psum`` for Gram-product
reductions riding ICI, ``all_gather`` for per-step DEMC chain heads.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"
CHAINS_AXIS = "chains"

__all__ = [
    "ROWS_AXIS",
    "CHAINS_AXIS",
    "init_distributed",
    "make_mesh",
    "row_sharding",
    "replicated_sharding",
    "shard_rows",
]


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (DCN) — thin passthrough to
    ``jax.distributed.initialize``. Call once per host before building
    meshes; single-host/single-process setups don't need it."""
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis_name: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def row_sharding(mesh: Mesh, axis_name: str | None = None) -> NamedSharding:
    """Sharding that splits axis 0 of a matrix across the mesh."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name, None))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(a, mesh: Mesh):
    """Place a matrix row-sharded on the mesh (device_put)."""
    return jax.device_put(a, row_sharding(mesh))
