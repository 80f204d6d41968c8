"""Batched on-device k-nearest-neighbor search.

Replaces the reference's KdTree (active_subspaces.rs:24,71-77,90-112) with
a dense pairwise-distance + ``lax.top_k`` formulation: O(N^2) FLOPs but MXU-
fast, fully vmappable, and exact. For query batches large enough that the
full (n_query, n_support) distance matrix would not fit, ``knn`` processes
queries in fixed-size chunks (streaming over HBM instead of materializing
the whole matrix).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from corrla_rs_tpu.ops.interp import pairwise_dists

__all__ = ["knn"]


@functools.partial(jax.jit, static_argnames=("k", "query_chunk"))
def knn(x_query: jnp.ndarray, x_support: jnp.ndarray, k: int,
        query_chunk: int | None = None):
    """k nearest support points for each query point.

    Args:
      x_query: (n_q, d); x_support: (n_s, d); k: neighbors.
      query_chunk: process queries in chunks of this size (defaults to all
        at once). Bounds peak memory at (query_chunk, n_s).
    Returns:
      (dists (n_q, k), idx (n_q, k)) sorted ascending by distance — matching
      the KdTree query order of active_subspaces.rs:90-112.
    """
    n_q = x_query.shape[0]

    def chunk_knn(xq):
        d = pairwise_dists(xq, x_support)
        neg_d, idx = lax.top_k(-d, k)
        return -neg_d, idx

    if query_chunk is None or query_chunk >= n_q:
        return chunk_knn(x_query)

    # pad to a multiple of query_chunk, scan over chunks
    n_chunks = -(-n_q // query_chunk)
    pad = n_chunks * query_chunk - n_q
    xq_pad = jnp.pad(x_query, ((0, pad), (0, 0)))
    xq_chunks = xq_pad.reshape(n_chunks, query_chunk, -1)
    d_chunks, i_chunks = lax.map(chunk_knn, xq_chunks)
    d_all = d_chunks.reshape(n_chunks * query_chunk, k)[:n_q]
    i_all = i_chunks.reshape(n_chunks * query_chunk, k)[:n_q]
    return d_all, i_all
