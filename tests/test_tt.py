"""Tensor-train decomposition (ops/tt) vs dense oracles."""
import numpy as np
import pytest

from corrla_rs_tpu.ops.tt import tt_dot, tt_norm, tt_reconstruct, tt_round, tt_svd


def _tt_random(rng, dims, ranks):
    """Random tensor with exact TT ranks; returns (dense, cores)."""
    rs = [1] + list(ranks) + [1]
    cores = [rng.standard_normal((rs[k], dims[k], rs[k + 1]))
             for k in range(len(dims))]
    t = cores[0]
    for g in cores[1:]:
        t = np.tensordot(t, g, axes=([t.ndim - 1], [0]))
    return t.reshape(dims), cores


@pytest.mark.slow
def test_exact_on_tt_rank_tensor(rng):
    dims, ranks = (6, 7, 5, 4), (2, 3, 2)
    dense, _ = _tt_random(rng, dims, ranks)
    cores = tt_svd(dense, ranks, key=0)
    shapes = [np.asarray(g).shape for g in cores]
    assert shapes[0][0] == 1 and shapes[-1][-1] == 1
    for k, r in enumerate(ranks):
        assert shapes[k][2] == r and shapes[k + 1][0] == r
    rec = np.asarray(tt_reconstruct(cores))
    np.testing.assert_allclose(rec, dense, atol=1e-10 * np.abs(dense).max())


def test_separable_function_compresses(rng):
    # f(i,j,k,l) = sin(ti+tj+tk+tl) has TT ranks exactly 2
    t = [np.linspace(0, 1, n) for n in (10, 11, 12, 13)]
    dense = np.sin(t[0][:, None, None, None] + t[1][None, :, None, None]
                   + t[2][None, None, :, None] + t[3][None, None, None, :])
    cores = tt_svd(dense, (2, 2, 2), key=1)
    rec = np.asarray(tt_reconstruct(cores))
    err = np.linalg.norm(rec - dense) / np.linalg.norm(dense)
    assert err < 1e-10
    n_params = sum(np.asarray(g).size for g in cores)
    assert n_params < dense.size / 30           # real compression


def test_quasi_optimal_truncation(rng):
    # truncating a full-rank tensor: error within sqrt(d-1) of the
    # sum of discarded unfolding singular values (Oseledets thm 2.2)
    dense = rng.standard_normal((8, 9, 7))
    ranks = (3, 3)
    cores = tt_svd(dense, ranks, key=2)
    err = np.linalg.norm(np.asarray(tt_reconstruct(cores)) - dense)
    bound = 0.0
    for k, r in enumerate(ranks):
        unf = dense.reshape(int(np.prod(dense.shape[:k + 1])), -1)
        s = np.linalg.svd(unf, compute_uv=False)
        bound += np.sum(s[r:] ** 2)
    assert err <= np.sqrt(bound) + 1e-12


def test_round_recompresses_exactly(rng):
    dims, ranks = (5, 6, 7, 4), (2, 3, 2)
    dense, _ = _tt_random(rng, dims, ranks)
    # build an inflated train (ranks padded via tt_svd with big ranks)
    fat = tt_svd(dense, (8, 12, 8), key=3)
    slim = tt_round(fat, ranks, key=4)
    for k, r in enumerate(ranks):
        assert np.asarray(slim[k]).shape[2] == r
    rec = np.asarray(tt_reconstruct(slim))
    np.testing.assert_allclose(rec, dense, atol=1e-9 * np.abs(dense).max())


def test_dot_and_norm(rng):
    dims = (4, 5, 6)
    a, ca = _tt_random(rng, dims, (2, 3))
    b, cb = _tt_random(rng, dims, (3, 2))
    np.testing.assert_allclose(float(tt_dot(ca, cb)), np.sum(a * b),
                               rtol=1e-10)
    np.testing.assert_allclose(float(tt_norm(ca)), np.linalg.norm(a),
                               rtol=1e-10)


@pytest.mark.slow
def test_large_unfolding_uses_rsvd(rng):
    # first unfolding is 64 x 16384 (> _RSVD_MIN_ELEMS): randomized path
    dims, ranks = (64, 64, 256), (3, 3)
    dense, _ = _tt_random(rng, dims, ranks)
    cores = tt_svd(dense.astype(np.float32), ranks, key=5)
    rec = np.asarray(tt_reconstruct(cores))
    err = np.linalg.norm(rec - dense) / np.linalg.norm(dense)
    assert err < 1e-4


def test_validation(rng):
    t = rng.standard_normal((4, 5, 6))
    with pytest.raises(ValueError, match="ranks"):
        tt_svd(t, (2,))
    with pytest.raises(ValueError, match=">= 1"):
        tt_svd(t, (2, 0))
    with pytest.raises(ValueError, match=">= 2"):
        tt_svd(np.arange(4.0), ())
    cores = tt_svd(t, (2, 2))
    with pytest.raises(ValueError, match="ranks"):
        tt_round(cores, (2,))
    with pytest.raises(ValueError, match="length"):
        tt_dot(cores, cores[:2])
    b = tt_svd(rng.standard_normal((4, 9, 6)), (2, 2))
    with pytest.raises(ValueError, match="mode dims"):
        tt_dot(cores, b)
