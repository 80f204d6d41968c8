"""Pallas TPU kernels for the pairwise-distance hot path.

The reference builds RBF kernel matrices with an O(n^2) scalar double loop
(interp_utils.rs:96-106) and queries a KdTree point-by-point
(active_subspaces.rs:90-112). The XLA rebuild already turns both into MXU
Gram matmuls (ops/interp.py, ops/knn.py); these Pallas kernels go further
for the *large-N* regime (SURVEY.md §7 hard part 5):

- ``rbf_matvec_streaming``: y(q) = sum_j phi(||q - x_j||) @ coeffs_j fused
  in one pass — the (M, N) kernel matrix is never materialized in HBM.
  Distance tile (MXU Gram) -> kernel phi (VPU) -> tile matvec (MXU) ->
  accumulate, all in VMEM. HBM traffic drops from O(M*N) to
  O((M + N) * d + M * c).
- ``pairwise_kernel_matrix``: fused distance + phi evaluation, tiled; for
  when the matrix itself is wanted (RBF fit) without a separate distance
  round-trip.

Both have XLA fallbacks (``interp.pairwise_dists`` path) and run in Pallas
interpret mode on CPU for tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from corrla_rs_tpu.ops.interp import rbf_kernel_eval

__all__ = ["pairwise_kernel_matrix", "rbf_matvec_streaming"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(x, rows):
    pad = rows - x.shape[0]
    return x if pad == 0 else jnp.pad(x, ((0, pad), (0, 0)))


def _dot_f32(a, b):
    """MXU dot with deterministic ~f32 accuracy via manual bf16x3 split.

    Mosaic's handling of ``precision=HIGHEST`` proved layout-dependent on
    v5e (exact for some operand kinds, wrong by ~0.3 for computed LHS
    operands, silently bf16 in others); splitting the operands explicitly
    into hi/lo bf16 parts and summing three default-precision dots (each
    f32-accumulated) is correct everywhere by construction.
    """
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dist_tile(qa, xb):
    """Euclidean distances between row tiles via the Gram expansion."""
    a2 = jnp.sum(qa * qa, axis=1, keepdims=True)
    b2 = jnp.sum(xb * xb, axis=1, keepdims=True)
    ab = _dot_f32(qa, xb.T)
    d2 = jnp.maximum(a2 + b2.T - 2.0 * ab, 0.0)
    return jnp.sqrt(d2)


def _kernel_matrix_body(kernel, eps):
    def body(qa_ref, xb_ref, out_ref):
        out_ref[:] = rbf_kernel_eval(
            _dist_tile(qa_ref[:], xb_ref[:]), kernel, eps
        ).astype(out_ref.dtype)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "eps", "tile_m", "tile_n", "interpret"),
)
def pairwise_kernel_matrix(xa, xb, kernel: str = "linear", eps: float = 1.0,
                           tile_m: int = 256, tile_n: int = 256,
                           interpret: bool = False):
    """phi(||xa_i - xb_j||) as an (n_a, n_b) matrix, fused in one kernel."""
    n_a, d = xa.shape
    n_b = xb.shape[0]
    m_pad = _round_up(n_a, tile_m)
    n_pad = _round_up(n_b, tile_n)
    xa_p = _pad_rows(jnp.asarray(xa, jnp.float32), m_pad)
    xb_p = _pad_rows(jnp.asarray(xb, jnp.float32), n_pad)

    out = pl.pallas_call(
        _kernel_matrix_body(kernel, eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), jnp.float32),
        grid=(m_pad // tile_m, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xa_p, xb_p)
    return out[:n_a, :n_b]


def _matvec_body(kernel, eps, n_cols):
    def body(q_ref, xb_ref, c_ref, out_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        phi = rbf_kernel_eval(_dist_tile(q_ref[:], xb_ref[:]), kernel, eps)
        out_ref[:] += _dot_f32(phi, c_ref[:]).astype(out_ref.dtype)

    return body


@functools.partial(
    jax.jit,
    static_argnames=("kernel", "eps", "tile_m", "tile_n", "interpret"),
)
def rbf_matvec_streaming(x_query, x_support, coeffs, kernel: str = "linear",
                         eps: float = 1.0, tile_m: int = 256,
                         tile_n: int = 512, interpret: bool = False):
    """sum_j phi(||q_i - x_j||) coeffs[j] without materializing (M, N).

    coeffs: (n_support, c). Returns (n_query, c). Padding rows of the
    support contribute phi(||q - 0||) * 0 = 0 because coeff padding is
    zero, so results are exact for any shape.
    """
    n_q, d = x_query.shape
    n_s = x_support.shape[0]
    n_cols = coeffs.shape[1]
    c = n_cols
    m_pad = _round_up(n_q, tile_m)
    n_pad = _round_up(n_s, tile_n)
    q_p = _pad_rows(jnp.asarray(x_query, jnp.float32), m_pad)
    s_p = _pad_rows(jnp.asarray(x_support, jnp.float32), n_pad)
    c_p = _pad_rows(jnp.asarray(coeffs, jnp.float32), n_pad)

    out = pl.pallas_call(
        _matvec_body(kernel, eps, n_cols),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), jnp.float32),
        grid=(m_pad // tile_m, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q_p, s_p, c_p)
    return out[:n_q, :n_cols]
