"""Out-of-core streaming drivers (ops/streaming) vs the in-memory paths.

The streamed gram/power RSVD computes the algebraically identical
iteration (A (A^T A)^q Omega with per-iteration stabilization) with the
SAME sketch draw as the in-memory ``random_svd``, so f64 parity is tight.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.random_svd import random_svd, single_pass_svd
from corrla_rs_tpu.ops.streaming import (
    RowBlockSource,
    streamed_gram,
    streamed_hosvd,
    streamed_pca,
    streamed_random_svd,
    streamed_single_pass_svd,
)


def _decaying_matrix(rng, n, m, power=2.0):
    u, _ = np.linalg.qr(rng.standard_normal((n, m)))
    v, _ = np.linalg.qr(rng.standard_normal((m, m)))
    s = (np.arange(1, m + 1, dtype=np.float64)) ** (-power)
    return (u * s[None, :]) @ v.T


@pytest.mark.parametrize("method", ["gram", "power"])
@pytest.mark.parametrize("n,block", [(300, 300), (301, 64), (300, 128)])
def test_streamed_rsvd_matches_in_memory(rng, method, n, block):
    a = _decaying_matrix(rng, n, 24)
    u0, s0, vt0 = random_svd(jnp.asarray(a), 8, 6, 8, key=3,
                             stabilize="always")
    u1, s1, vt1 = streamed_random_svd(
        a, 8, 6, 8, key=3, block_rows=block, method=method
    )
    assert u1.shape == (n, 8) and s1.shape == (8,) and vt1.shape == (8, 24)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-8)
    # subspaces match: projectors agree (columns may differ by sign)
    p0 = np.asarray(u0) @ np.asarray(u0).T
    p1 = np.asarray(u1) @ np.asarray(u1).T
    np.testing.assert_allclose(p1, p0, atol=1e-7)
    # reconstruction error matches the best rank-8 approximation (the
    # sigma-tail residual is inherent to truncation, not the streaming)
    rec = np.asarray(u1) * np.asarray(s1)[None, :] @ np.asarray(vt1)
    uu, ss, vv = np.linalg.svd(a, full_matrices=False)
    best = (uu[:, :8] * ss[None, :8]) @ vv[:8]
    err = np.linalg.norm(rec - a)
    err_best = np.linalg.norm(best - a)
    assert err <= err_best * (1 + 1e-6)


def test_streamed_rsvd_sigma_accuracy_vs_truth(rng):
    a = _decaying_matrix(rng, 400, 30)
    s_true = np.linalg.svd(a, compute_uv=False)[:6]
    _u, s, _vt = streamed_random_svd(a, 6, 8, 10, key=0, block_rows=96)
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-9)


def test_row_block_source_matches_array(rng):
    a = _decaying_matrix(rng, 200, 16)
    src = RowBlockSource(lambda s, e: a[s:e], a.shape, a.dtype)
    u0, s0, vt0 = streamed_random_svd(a, 5, 4, 6, key=1, block_rows=64)
    u1, s1, vt1 = streamed_random_svd(src, 5, 4, 6, key=1, block_rows=64)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s0))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0))


def test_row_block_source_validates():
    src = RowBlockSource(lambda s, e: np.zeros((e - s, 3)), (10, 4))
    with pytest.raises(ValueError, match="expected"):
        src[0:2]
    with pytest.raises(TypeError, match="contiguous"):
        src[::2]


def test_streamed_gram(rng):
    a = rng.standard_normal((130, 7))
    g, csum, n = streamed_gram(a, block_rows=32)
    np.testing.assert_allclose(np.asarray(g), a.T @ a, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(csum), a.sum(0), rtol=1e-12)
    assert n == 130


@pytest.mark.slow
def test_streamed_pca_matches_rpca(rng):
    from corrla_rs_tpu.api import rpca

    a = rng.standard_normal((500, 12)) @ np.diag(
        np.array([5.0, 4, 3, 2] + [0.1] * 8)
    )
    s0, comps0 = rpca(jnp.asarray(a), 4, 20, 10)
    s1, comps1 = streamed_pca(a, 4, block_rows=128)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-7)
    # components match up to per-row sign
    c0, c1 = np.asarray(comps0), np.asarray(comps1)
    sign = np.sign(np.sum(c0 * c1, axis=1, keepdims=True))
    np.testing.assert_allclose(c1 * sign, c0, atol=1e-7)


def test_streamed_single_pass_exact_on_low_rank(rng):
    # exactly rank-4 data: any consistent sketch recovers it fp-exactly
    a = rng.standard_normal((257, 20)) @ rng.standard_normal((20, 4)) @ \
        rng.standard_normal((4, 18))
    u, s, vt = streamed_single_pass_svd(a, 4, 6, key=2, block_rows=64)
    s_true = np.linalg.svd(a, compute_uv=False)[:4]
    np.testing.assert_allclose(np.asarray(s), s_true, rtol=1e-9)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(vt)
    assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-9
    # in-memory single-pass agrees on the sigmas at sketch tolerance
    _u2, s2, _vt2 = single_pass_svd(jnp.asarray(a), 4, 6, key=2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s), rtol=1e-8)


def test_streamed_hosvd_matches_in_memory(rng):
    from corrla_rs_tpu.ops.hosvd import hosvd, tucker_reconstruct

    # multilinear-rank (3, 2, 2) tensor + noise, long axis 0
    g = rng.standard_normal((3, 2, 2))
    u0 = np.linalg.qr(rng.standard_normal((120, 3)))[0]
    u1 = np.linalg.qr(rng.standard_normal((6, 2)))[0]
    u2 = np.linalg.qr(rng.standard_normal((5, 2)))[0]
    t = np.einsum("abc,ia,jb,kc->ijk", g, u0, u1, u2)
    t = t + 1e-10 * rng.standard_normal(t.shape)

    core_m, fac_m = hosvd(jnp.asarray(t), (3, 2, 2))
    core_s, fac_s = streamed_hosvd(t, (3, 2, 2), block_slabs=32)
    assert core_s.shape == (3, 2, 2)
    for f, dim, r in zip(fac_s, (120, 6, 5), (3, 2, 2)):
        assert f.shape == (dim, r)
        # orthonormal columns
        np.testing.assert_allclose(
            np.asarray(f).T @ np.asarray(f), np.eye(r), atol=1e-8
        )
    rec_m = np.asarray(tucker_reconstruct(core_m, fac_m))
    rec_s = np.asarray(tucker_reconstruct(core_s, fac_s))
    np.testing.assert_allclose(rec_s, rec_m, atol=1e-8)
    np.testing.assert_allclose(rec_s, t, atol=1e-8)


def test_streamed_errors(rng):
    a = rng.standard_normal((10, 20))
    with pytest.raises(ValueError, match="n >= m"):
        streamed_random_svd(a, 2, 2, 2)
    with pytest.raises(ValueError, match="tall"):
        streamed_single_pass_svd(a, 2, 2)
    b = rng.standard_normal((20, 5))
    with pytest.raises(ValueError, match="center"):
        streamed_random_svd(b, 2, 2, 2, method="power", center=True)
    with pytest.raises(ValueError, match="method"):
        streamed_random_svd(b, 2, 2, 2, method="banana")
    with pytest.raises(ValueError, match="ranks"):
        streamed_hosvd(rng.standard_normal((8, 3, 3)), (2, 2))
    with pytest.raises(ValueError, match="must be in"):
        streamed_hosvd(rng.standard_normal((8, 3, 3)), (2, 5, 2))


def test_streamed_multi_device_matches_single(rng):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    devs = jax.devices()[:2]
    a = _decaying_matrix(rng, 200, 16)
    u0, s0, vt0 = streamed_random_svd(a, 6, 6, 8, key=3, block_rows=50)
    u1, s1, vt1 = streamed_random_svd(
        a, 6, 6, 8, key=3, block_rows=50, devices=devs
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-9)
    p0 = np.asarray(u0) @ np.asarray(u0).T
    p1 = np.asarray(u1) @ np.asarray(u1).T
    np.testing.assert_allclose(p1, p0, atol=1e-8)
    # PCA variant too
    s_p0, c0 = streamed_pca(a, 4, block_rows=50)
    s_p1, c1 = streamed_pca(a, 4, block_rows=50, devices=devs)
    np.testing.assert_allclose(np.asarray(s_p1), np.asarray(s_p0),
                               rtol=1e-9)
    # devices= demands the gram method
    with pytest.raises(ValueError, match="gram"):
        streamed_random_svd(a, 4, 4, 4, method="power", devices=devs)


@pytest.mark.slow
def test_streamed_rank_deficient_source(rng):
    # numerical rank below the sketch width (exactly rank-5 source in
    # f32): the m-space CholeskyQR's floored normalizer + ridge fallback
    # must keep the iteration finite, and the true sigmas stay accurate
    # (regression: NaN sigmas before the relative diagonal floor)
    basis = rng.standard_normal((5, 40)).astype(np.float32)
    scale = np.array([8, 4, 2, 1, 0.5], np.float32)
    coef = rng.standard_normal((3000, 5)).astype(np.float32)
    a = coef @ (basis * scale[:, None])
    u, s, vt = streamed_random_svd(a, 4, 8, 10, key=0, block_rows=512)
    s = np.asarray(s)
    assert np.isfinite(s).all()
    s_true = np.linalg.svd(a.astype(np.float64), compute_uv=False)[:4]
    np.testing.assert_allclose(s, s_true, rtol=2e-4)
    sp, _c = streamed_pca(a, 3, block_rows=512)
    assert np.isfinite(np.asarray(sp)).all()


def test_streamed_hosvd_mode0_rank_validated_up_front(rng):
    # review finding: ranks[0] > prod(other dims) must raise BEFORE
    # streaming, not die late with a broadcasting error
    with pytest.raises(ValueError, match="prod"):
        streamed_hosvd(rng.standard_normal((100, 2, 2)), (8, 2, 2))


def test_streamed_gram_skipped_when_unused(rng):
    # n_iter=0 without centering: sketch-only path must not stream the
    # gram pass (2 passes total); verified by counting source reads
    reads = []
    a = _decaying_matrix(rng, 128, 10)

    def fn(lo, hi):
        reads.append((lo, hi))
        return a[lo:hi]

    src = RowBlockSource(fn, a.shape, a.dtype)
    _u, s, _vt = streamed_random_svd(src, 3, 0, 4, key=1, block_rows=64)
    assert np.isfinite(np.asarray(s)).all()
    n_blocks = 2
    assert len(reads) == 2 * n_blocks  # Y pass + B pass only


def test_pair_fit_single_sample_raises(rng):
    import jax.numpy as jnp

    from corrla_rs_tpu.ops import vine as v

    with pytest.raises(ValueError, match="at least 2"):
        v._fit_pair(jnp.asarray([0.5]), jnp.asarray([0.5]))


def test_streamed_pod_matches_in_memory(rng):
    from corrla_rs_tpu.models.pod import PodI
    from corrla_rs_tpu.ops.streaming import streamed_pod
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    # Gaussian pulse family (the reference POD fixture shape): snapshots
    # over a 3000-point grid, exogenous variable t
    nx, ns = 3000, 20
    xg = np.linspace(0, 10, nx)
    tg = np.linspace(1, 9, ns)[:, None]
    p = (0.5 * tg) * np.exp(-((xg[None, :] - tg) ** 2) / 4.0)

    ref = PodI(jnp.asarray(p), jnp.asarray(tg), 4)
    st = streamed_pod(p, tg, 4, block_cols=700)
    assert st.modes.shape == (nx, 4)
    # modes orthonormal and spanning the same subspace
    m = np.asarray(st.modes)
    np.testing.assert_allclose(m.T @ m, np.eye(4), atol=1e-9)
    mr = np.asarray(ref.modes)
    overlap = np.linalg.svd(mr.T @ m, compute_uv=False)
    assert overlap[-1] > 1 - 1e-9
    # identical predictions (the fitted surrogate is the deliverable)
    tq = np.array([[5.2], [2.5], [7.7]])
    np.testing.assert_allclose(
        np.asarray(st.predict(jnp.asarray(tq))),
        np.asarray(ref.predict(jnp.asarray(tq))), atol=1e-8,
    )
    # the streamed fit is a real PodI: checkpoint round-trips
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "pod.npz")
        save_model(path, st)
        st2 = load_model(path)
        np.testing.assert_allclose(
            np.asarray(st2.predict(jnp.asarray(tq))),
            np.asarray(st.predict(jnp.asarray(tq))), atol=1e-12,
        )


def test_streamed_pod_validates(rng):
    from corrla_rs_tpu.ops.streaming import streamed_pod

    with pytest.raises(ValueError, match="2-D"):
        streamed_pod(rng.standard_normal((4, 5, 6)), np.zeros((4, 1)), 2)
    with pytest.raises(ValueError, match="match"):
        streamed_pod(rng.standard_normal((4, 50)), np.zeros((3, 1)), 2)


@pytest.mark.slow
def test_streamed_dmdc_matches_in_memory():
    from corrla_rs_tpu.models.dmd import DMDc
    from corrla_rs_tpu.ops.mat_utils import mat_linspace
    from corrla_rs_tpu.ops.streaming import streamed_dmdc
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    # forced sine field (the reference DMDc fixture family,
    # dmd_rom.rs:243-267) on a 400-point grid
    nx, nt = 400, 40
    xg = np.asarray(mat_linspace(0.0, 10.0, nx)[:, 0])
    tg = np.asarray(mat_linspace(0.0, 10.0, nt)[:, 0])
    u = np.exp(0.2 * tg)[None, :]
    p = np.sin(xg[:, None] + 0.2 * tg[None, :]) * u

    ref = DMDc(jnp.asarray(p), jnp.asarray(u), n_modes=14, n_iters=40)
    st = streamed_dmdc(p, u, n_modes=14, block_rows=96)
    assert st.n_x == nx and st.n_u == 1 and st.n_modes == 14
    assert st._u_hat.shape == (nx, 14)

    # the fixture is rank-~3, so the streamed exact path rank-cuts the
    # junk directions to exact zeros while the randomized path fills
    # them with noise eigenvalues; every RESOLVED streamed eigenvalue
    # must appear in the reference spectrum
    resolved = st.lambdas[np.abs(st.lambdas) > 1e-6]
    assert resolved.size >= 2   # the growing oscillation pair at least
    for lam in resolved:
        assert np.min(np.abs(ref.lambdas - lam)) < 1e-6, lam
    # the dominant (growing) pair is present and correct
    dom = ref.lambdas[np.argmax(np.abs(ref.lambdas))]
    assert np.min(np.abs(resolved - dom)) < 1e-8
    # rollouts agree with each other and with the truth (ref tol 5e-2,
    # dmd_rom.rs:309) in every rollout variant
    x0 = jnp.asarray(p[:, 0:1])
    pr = np.asarray(ref.predict_multiple(x0, jnp.asarray(u)))
    for method in ("dense", "modes", "reduced"):
        ps = np.asarray(
            st.predict_multiple(x0, jnp.asarray(u), method=method)
        )
        np.testing.assert_allclose(ps[:, 19], pr[:, 19], atol=1e-6)
        np.testing.assert_allclose(ps[:, 19], p[:, 20], atol=5e-2)

    # the streamed fit is a real DMDc: single-step + checkpoint round-trip
    one = np.asarray(st.predict(x0, jnp.asarray(u[:, 0:1])))
    np.testing.assert_allclose(one[:, 0], pr[:, 0], atol=1e-6)
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dmdc.npz")
        save_model(path, st)
        st2 = load_model(path)
        np.testing.assert_allclose(
            np.asarray(st2.predict_multiple(x0, jnp.asarray(u))),
            np.asarray(st.predict_multiple(x0, jnp.asarray(u))),
            atol=1e-10,
        )


def test_streamed_dmdc_generated_source():
    # RowBlockSource: spatial rows generated on demand — nothing ever
    # materialized at (n_x, n_t); padding block (nx % block != 0) covered
    from corrla_rs_tpu.ops.streaming import streamed_dmdc

    nx, nt = 531, 30
    tg = np.linspace(0.0, 6.0, nt)
    u = np.exp(0.1 * tg)[None, :]

    def rows(lo, hi):
        xg = np.linspace(0.0, 10.0, nx)[lo:hi]
        return np.sin(xg[:, None] + 0.3 * tg[None, :]) * u

    src = RowBlockSource(rows, (nx, nt), np.float64)
    st = streamed_dmdc(src, u, n_modes=10, block_rows=128)
    x0 = jnp.asarray(rows(0, nx)[:, 0:1])
    pred = np.asarray(st.predict_multiple(x0, jnp.asarray(u)))
    truth = rows(0, nx)
    np.testing.assert_allclose(pred[:, 14], truth[:, 15], atol=5e-2)


def test_streamed_dmdc_validates(rng):
    from corrla_rs_tpu.ops.streaming import streamed_dmdc

    with pytest.raises(ValueError, match="2-D"):
        streamed_dmdc(rng.standard_normal((4, 5, 6)), np.zeros((1, 5)), 2)
    with pytest.raises(ValueError, match="n_t"):
        streamed_dmdc(rng.standard_normal((40, 30)), np.zeros((1, 29)), 2)


def test_streamed_cov_and_pearson_match_in_memory(rng):
    from corrla_rs_tpu.ops.stats_corr import mat_cov_centered, pearson_corr
    from corrla_rs_tpu.ops.streaming import (
        streamed_cov,
        streamed_pearson_corr,
    )

    # correlated columns with nonzero means (exercises the implicit
    # centering), n not divisible by the block size (padding lane)
    n, m = 1003, 6
    base = rng.standard_normal((n, m))
    base[:, 1] = 0.7 * base[:, 0] + 0.3 * base[:, 1]
    x = base + np.array([1.0, -2.0, 0.5, 0.0, 3.0, -1.0])[None, :]

    np.testing.assert_allclose(
        np.asarray(streamed_cov(x, block_rows=256)),
        np.asarray(mat_cov_centered(jnp.asarray(x))), atol=1e-10,
    )
    c_st = np.asarray(streamed_pearson_corr(x, block_rows=256))
    np.testing.assert_allclose(
        c_st, np.asarray(pearson_corr(jnp.asarray(x))), atol=1e-10,
    )
    np.testing.assert_allclose(np.diag(c_st), np.ones(m), atol=1e-12)


def test_streamed_cov_multi_device(rng):
    import jax

    from corrla_rs_tpu.ops.stats_corr import mat_cov_centered
    from corrla_rs_tpu.ops.streaming import streamed_cov

    x = rng.standard_normal((800, 5)) + 2.0
    got = streamed_cov(x, block_rows=128, devices=jax.devices()[:4])
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(mat_cov_centered(jnp.asarray(x))),
        atol=1e-10,
    )
