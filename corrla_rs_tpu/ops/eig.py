"""Nonsymmetric (complex) eigendecomposition with a CPU host callback.

TPU/XLA has no nonsymmetric ``eig`` lowering. Wherever the reference takes a
complex eigendecomposition of a *small* matrix (DMDc's r x r reduced
operator, dmd_rom.rs:112-125), the rebuild ships the tiny matrix to host
LAPACK via ``jax.pure_callback`` — negligible cost for r = n_modes <~ 100 —
while everything surrounding it stays on-device and jittable.

Symmetric problems (active_subspaces' C = G G^T / N, active_subspaces.rs:260)
do NOT use this: ``jnp.linalg.eigh`` is native on TPU and is used there.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["eig"]


def _host_eig(a):
    vals, vecs = np.linalg.eig(np.asarray(a))
    ctype = np.complex64 if a.dtype == np.float32 else np.complex128
    return vals.astype(ctype), vecs.astype(ctype)


def eig(a: jnp.ndarray):
    """Eigenvalues and right eigenvectors of a real square matrix.

    jit-safe (uses jax.pure_callback). Returns (vals (n,), vecs (n, n)),
    both complex.
    """
    n = a.shape[-1]
    ctype = jnp.complex64 if a.dtype == jnp.float32 else jnp.complex128
    out_shape = (
        jax.ShapeDtypeStruct(a.shape[:-2] + (n,), ctype),
        jax.ShapeDtypeStruct(a.shape, ctype),
    )
    return jax.pure_callback(_host_eig, out_shape, a, vmap_method="sequential")
