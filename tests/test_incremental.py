"""Incremental SVD/PCA (ops/incremental) vs batch ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.incremental import IncrementalPca, IncrementalSvd


def _low_rank(rng, n, m, r):
    return rng.standard_normal((n, r)) @ rng.standard_normal((r, m))


def test_incremental_svd_exact_on_low_rank(rng):
    # rank stays <= the tracked rank -> Brand updates are fp-exact
    n, m, r = 80, 60, 5
    a = _low_rank(rng, n, m, r)
    inc = IncrementalSvd(rank=5)
    for lo in range(0, m, 7):          # uneven batches incl. a tail
        inc.update(a[:, lo:lo + 7])
    assert inc.n_cols == m
    s_true = np.linalg.svd(a, compute_uv=False)[:5]
    np.testing.assert_allclose(np.asarray(inc.s), s_true, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(inc.reconstruct()), a, atol=1e-8)
    # left factors orthonormal
    u = np.asarray(inc.u)
    np.testing.assert_allclose(u.T @ u, np.eye(5), atol=1e-10)


def test_incremental_svd_truncating_tracks_dominant(rng):
    # full-rank stream with decaying spectrum: the online truncation must
    # track the dominant subspace closely (greedy is near-optimal when
    # the spectrum decays fast)
    n, m = 100, 90
    u0 = np.linalg.qr(rng.standard_normal((n, n)))[0][:, :12]
    s0 = 2.0 ** (-np.arange(12, dtype=np.float64))
    a = (u0 * s0[None, :]) @ rng.standard_normal((12, m))
    inc = IncrementalSvd(rank=6, track_v=False)
    for lo in range(0, m, 10):
        inc.update(a[:, lo:lo + 10])
    assert inc.v is None
    s_true = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(inc.s)[:4], s_true[:4], rtol=1e-3)
    # dominant left subspace captured
    uu = np.linalg.svd(a, full_matrices=False)[0][:, :4]
    overlap = np.linalg.svd(uu.T @ np.asarray(inc.u), compute_uv=False)
    assert overlap[-1] > 0.999


def test_incremental_svd_single_column_and_validation(rng):
    a = _low_rank(rng, 30, 8, 3)
    inc = IncrementalSvd(rank=3)
    for j in range(8):
        inc.update(a[:, j])            # 1-D input accepted
    np.testing.assert_allclose(
        np.asarray(inc.s), np.linalg.svd(a, compute_uv=False)[:3],
        rtol=1e-9,
    )
    with pytest.raises(ValueError, match="rows"):
        inc.update(np.zeros((31, 2)))
    with pytest.raises(ValueError, match="track_v"):
        IncrementalSvd(2, track_v=False).update(a[:, :4]).reconstruct()


def test_incremental_pca_exact_on_low_rank(rng):
    # mean-shifted rank-3 rows absorbed in batches == batch PCA
    n, d, r = 300, 20, 3
    x = _low_rank(rng, n, d, r) + 5.0 * rng.standard_normal(d)[None, :]
    ipca = IncrementalPca(n_components=3)
    for lo in range(0, n, 64):
        ipca.partial_fit(x[lo:lo + 64])
    assert ipca.n_samples_seen_ == n
    mu = x.mean(axis=0)
    np.testing.assert_allclose(np.asarray(ipca.mean_), mu, atol=1e-10)
    s_true = np.linalg.svd(x - mu[None, :], compute_uv=False)[:3]
    np.testing.assert_allclose(
        np.asarray(ipca.singular_values_), s_true, rtol=1e-8
    )
    # components span the batch-PCA row space
    vt = np.linalg.svd(x - mu[None, :], full_matrices=False)[2][:3]
    overlap = np.linalg.svd(
        vt @ np.asarray(ipca.components_).T, compute_uv=False
    )
    np.testing.assert_allclose(overlap, np.ones(3), atol=1e-9)
    # round-trip on the captured subspace
    z = ipca.transform(x[:10])
    back = np.asarray(ipca.inverse_transform(z))
    np.testing.assert_allclose(back, x[:10], atol=1e-8)


def test_incremental_pca_matches_sklearn(rng):
    from sklearn.decomposition import IncrementalPCA as SkIPCA

    n, d = 400, 12
    x = rng.standard_normal((n, d)) @ np.diag(
        np.array([6.0, 5, 4, 3, 2, 1] + [0.3] * 6)
    ) + np.arange(d)[None, :]
    ours = IncrementalPca(n_components=4)
    theirs = SkIPCA(n_components=4, batch_size=100)
    for lo in range(0, n, 100):
        ours.partial_fit(x[lo:lo + 100])
        theirs.partial_fit(x[lo:lo + 100])
    np.testing.assert_allclose(
        np.asarray(ours.singular_values_), theirs.singular_values_,
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(ours.mean_), theirs.mean_,
                               atol=1e-10)
    # same subspace (per-row signs may differ)
    overlap = np.linalg.svd(
        theirs.components_ @ np.asarray(ours.components_).T,
        compute_uv=False,
    )
    np.testing.assert_allclose(overlap, np.ones(4), atol=1e-6)


def test_incremental_pca_validates(rng):
    ipca = IncrementalPca(2).partial_fit(rng.standard_normal((10, 4)))
    with pytest.raises(ValueError, match="features"):
        ipca.partial_fit(np.zeros((5, 6)))
    with pytest.raises(ValueError, match="batch"):
        IncrementalPca(2).partial_fit(np.zeros(4))
