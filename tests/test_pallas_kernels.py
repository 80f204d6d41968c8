"""Pallas kernel tests (interpret mode on the CPU backend)."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.interp import pairwise_dists, rbf_kernel_eval
from corrla_rs_tpu.ops.pallas_kernels import (
    pairwise_kernel_matrix,
    rbf_matvec_streaming,
)


@pytest.mark.parametrize("kernel", ["linear", "multiquadric", "gaussian", "cubic"])
def test_pairwise_kernel_matrix_matches_xla(rng, kernel):
    xa = jnp.asarray(rng.standard_normal((70, 3)), jnp.float32)
    xb = jnp.asarray(rng.standard_normal((50, 3)), jnp.float32)
    got = pairwise_kernel_matrix(
        xa, xb, kernel=kernel, eps=0.7, tile_m=32, tile_n=32, interpret=True
    )
    want = rbf_kernel_eval(pairwise_dists(xa, xb), kernel, 0.7)
    # bf16x3 split-dot accuracy (see ops.pallas_kernels._dot_f32)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-4
    )


def test_rbf_matvec_streaming_matches_materialized(rng):
    q = jnp.asarray(rng.standard_normal((45, 4)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((130, 4)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((130, 2)), jnp.float32)
    got = rbf_matvec_streaming(
        q, s, c, kernel="multiquadric", eps=1.0, tile_m=16, tile_n=64,
        interpret=True,
    )
    k = rbf_kernel_eval(pairwise_dists(q, s), "multiquadric", 1.0)
    want = k @ c
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-3
    )


def test_streaming_exact_at_odd_shapes(rng):
    # shapes deliberately not tile multiples; zero-padded support must not
    # contaminate results
    q = jnp.asarray(rng.standard_normal((7, 2)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((13, 2)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((13, 1)), jnp.float32)
    got = rbf_matvec_streaming(
        q, s, c, kernel="gaussian", eps=0.5, tile_m=8, tile_n=8,
        interpret=True,
    )
    k = rbf_kernel_eval(pairwise_dists(q, s), "gaussian", 0.5)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(k @ c), rtol=2e-3, atol=1e-3
    )
