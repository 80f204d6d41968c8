"""PCA via randomized SVD.

Parity with reference pca_rsvd.rs:13-112 (``PcaRsvd`` + ``ApplyTransform``):
column-center, RSVD with 20 power iterations and min(n_dim, 10) oversamples
(pca_rsvd.rs:65-66), store singular values and components (= V rows);
``explained_var`` = s^2 / (n-1) (pca_rsvd.rs:91-99); forward transform
centers then projects (pca_rsvd.rs:43-46); inverse transform projects back
and re-adds the training means (pca_rsvd.rs:49-52).

The fitted state is a pytree of arrays — trivially checkpointable
(``jnp.savez`` / orbax) and shardable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from corrla_rs_tpu.ops.mat_utils import PRECISION, col_means
from corrla_rs_tpu.ops.random_svd import random_svd
from corrla_rs_tpu.utils.config import PcaConfig
from corrla_rs_tpu.utils.prng import as_key

# Reference defaults (pca_rsvd.rs:65-66): 20 power iterations,
# min(n_dim, 10) oversamples. Single source of truth: utils.config.
PCA_N_ITER = PcaConfig().n_iter
PCA_MAX_OVERSAMPLES = PcaConfig().max_oversamples


@functools.partial(
    jax.jit, static_argnames=("rank", "n_iter", "max_oversamples", "stabilize")
)
def _pca_fit_kernel(x, rank, n_iter, max_oversamples, key, stabilize):
    means = col_means(x)
    cx = x - means
    n_oversamples = min(x.shape[1], max_oversamples)
    _u, s, vt = random_svd(
        cx, rank, n_iter, n_oversamples, key=key, stabilize=stabilize
    )
    return means, s, vt


class PcaRsvd:
    """PCA of a (n_samples, n_dim) data matrix using randomized SVD.

    Pass ``mesh=`` (a 1-D jax.sharding.Mesh) to fit on a row-sharded
    multi-chip layout: the centering is elementwise (sharding-preserving)
    and the RSVD runs the psum-Gram/CholeskyQR2 kernel from
    parallel.sharded_rsvd.
    """

    def __init__(self, x_mat, rank: int, key=0, n_iter: int | None = None,
                 stabilize: str = "auto", mesh=None,
                 config: PcaConfig | None = None):
        cfg = config or PcaConfig()
        self.pca_rank = int(rank)
        self._n_iter = int(n_iter if n_iter is not None else cfg.n_iter)
        self._max_oversamples = int(cfg.max_oversamples)
        self._stabilize = stabilize if config is None else cfg.stabilize
        self._mesh = mesh
        self.fit(x_mat, rank, key=key)

    def fit(self, x_mat, rank: int, key=0):
        """(Re)fit, parity with pca_rsvd.rs:85-88."""
        if self._mesh is None:
            from corrla_rs_tpu.utils.smallpath import maybe_route_small

            (x_mat,) = maybe_route_small(x_mat)
        x = jnp.asarray(x_mat)
        self.pca_rank = int(rank)
        self.n_samples = x.shape[0]
        if self._mesh is not None:
            from corrla_rs_tpu.parallel.mesh import shard_rows
            from corrla_rs_tpu.parallel.sharded_rsvd import sharded_random_svd

            x = shard_rows(x, self._mesh)
            means = col_means(x)
            n_oversamples = min(x.shape[1], self._max_oversamples)
            _u, s, vt = sharded_random_svd(
                x - means, self.pca_rank, self._n_iter, n_oversamples,
                key=as_key(key), mesh=self._mesh,
            )
            self.means, self.pca_s, self.components_ = means, s, vt
            return self
        self.means, self.pca_s, self.components_ = _pca_fit_kernel(
            x, self.pca_rank, self._n_iter, self._max_oversamples,
            as_key(key), self._stabilize,
        )
        return self

    def explained_var(self) -> jnp.ndarray:
        """Per-component explained variance s^2/(n-1). pca_rsvd.rs:91-99."""
        return self.pca_s**2 / (self.n_samples - 1.0)

    @property
    def components(self) -> jnp.ndarray:
        """Principal directions, rows = components (r, n_dim)."""
        return self.components_

    @property
    def singular_values(self) -> jnp.ndarray:
        return self.pca_s

    def apply_tr(self, targ_mat) -> jnp.ndarray:
        """Center (by the target's own column means, parity with
        pca_rsvd.rs:43-46 which calls center_mat_col) and project."""
        t = jnp.asarray(targ_mat)
        ct = t - col_means(t)
        return jnp.matmul(ct, self.components_.T, precision=PRECISION)

    def apply_inv_tr(self, red_mat) -> jnp.ndarray:
        """Map reduced coords back and re-add training means. pca_rsvd.rs:49-52."""
        r = jnp.asarray(red_mat)
        return jnp.matmul(r, self.components_, precision=PRECISION) + self.means
