"""Active-subspace parity tests (reference active_subspaces.rs:281-386)."""
import jax.numpy as jnp
import numpy as np
import pytest

import corrla_rs_tpu as crt
from corrla_rs_tpu.models.active_subspaces import (
    ActiveSsRsvd,
    PolyGradientEstimator,
)
from corrla_rs_tpu.ops.knn import knn
from corrla_rs_tpu.ops.stats_corr import sample_mv_normal
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def test_knn_matches_bruteforce(rng):
    xs = jnp.asarray(rng.standard_normal((50, 3)))
    xq = jnp.asarray(rng.standard_normal((7, 3)))
    d, idx = knn(xq, xs, 5)
    d_np = np.linalg.norm(
        np.asarray(xq)[:, None, :] - np.asarray(xs)[None, :, :], axis=-1
    )
    idx_np = np.argsort(d_np, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(idx), idx_np)
    np.testing.assert_allclose(
        np.asarray(d), np.sort(d_np, axis=1)[:, :5], rtol=1e-10
    )


def test_knn_chunked_matches_unchunked(rng):
    xs = jnp.asarray(rng.standard_normal((64, 4)))
    xq = jnp.asarray(rng.standard_normal((33, 4)))
    d1, i1 = knn(xq, xs, 6)
    d2, i2 = knn(xq, xs, 6, query_chunk=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12)


def test_knn_support_streaming_matches_unchunked(rng):
    # support_chunk streams the support set with a running top-k merge —
    # must be exact vs the dense path, including non-divisible chunk sizes
    # (padded rows masked to +inf) and combined with query chunking
    xs = jnp.asarray(rng.standard_normal((157, 4)))
    xq = jnp.asarray(rng.standard_normal((23, 4)))
    d1, i1 = knn(xq, xs, 7)
    for s_chunk in (16, 50, 157, 200):
        d2, i2 = knn(xq, xs, 7, support_chunk=s_chunk)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-12)
    d3, i3 = knn(xq, xs, 7, query_chunk=8, support_chunk=32)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i3))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d3), rtol=1e-12)


def test_knn_k_validation(rng):
    xs = jnp.asarray(rng.standard_normal((5, 2)))
    with pytest.raises(ValueError, match="exceeds"):
        knn(xs, xs, 6)


def test_grad_est_quadratic(rng):
    # Parity with active_subspaces.rs:287-322: grad of x1^2 + x2^2.
    cov = jnp.array([[0.9, 0.5], [0.5, 0.9]])
    x = sample_mv_normal(cov, 100, key=0, mode="reference")
    y = (x[:, 0] ** 2 + x[:, 1] ** 2)[:, None]
    est = PolyGradientEstimator(x, y, est_order=2, n_nbrs=14)

    g0 = est.grad_at(jnp.array([0.0, 0.0]))
    assert_mat_approx_eq(g0, jnp.array([[0.0, 0.0]]), 1e-2)
    g1 = est.grad_at(jnp.array([1.0, 0.0]))
    assert_mat_approx_eq(g1, jnp.array([[2.0, 0.0]]), 1e-2)
    g2 = est.grad_at(jnp.array([-1.0, 0.0]))
    assert_mat_approx_eq(g1, -g2, 1e-2)


def test_grad_est_linear_order(rng):
    x = jnp.asarray(rng.standard_normal((200, 3)))
    y = (2.0 * x[:, 0] - 0.5 * x[:, 1] + 3.0)[:, None]
    est = PolyGradientEstimator(x, y, est_order=1, n_nbrs=10)
    g = est.grad_batch(x[:5])
    expect = jnp.tile(jnp.array([[2.0, -0.5, 0.0]]), (5, 1))
    assert_mat_approx_eq(g, expect, 1e-8)


def _aniso_fixture():
    # Parity with active_subspaces.rs:324-385.
    cov = jnp.array(
        [[0.9, 0.5, 0.5], [0.5, 0.9, 0.5], [0.5, 0.5, 0.9]]
    )
    x = sample_mv_normal(cov, 100, key=1, mode="reference")
    y = (0.2 * x[:, 0] + 0.5 * x[:, 1] ** 2 + 0.1 * x[:, 2] * x[:, 0])[:, None]
    return x, y


def test_active_ss_evd_path():
    x, y = _aniso_fixture()
    est = PolyGradientEstimator(x, y, est_order=2, n_nbrs=14)
    fitted = ActiveSsRsvd(est, 2).fit(x)

    comps = fitted.components
    vals = fitted.singular_vals
    assert comps.shape == (3, 2)
    # x2 dominates gradient variability -> first component dominated by x2
    assert abs(float(comps[0, 0])) < abs(float(comps[1, 0]))
    assert float(vals[0, 0]) > float(vals[1, 1])

    # gradient check at a point (active_subspaces.rs:364-367)
    g = est.grad_at(jnp.array([0.0, 1.0, 0.0]))
    assert_mat_approx_eq(g, jnp.array([[0.2, 1.0, 0.0]]), 1e-1)

    # transform round shapes (active_subspaces.rs:370-373)
    tr = fitted.transform(x)
    assert tr.shape == (100, 2)
    back = fitted.inv_transform(tr)
    assert back.shape == (100, 3)

    # sensitivity: x2 dominates (active_subspaces.rs:379-384)
    sens = fitted.var_diag_evd_sensi()
    assert sens.shape == (3,)
    assert float(sens[1]) > float(sens[0])
    assert float(sens[1]) > float(sens[2])
    # the corrected activity score agrees on the dominant variable
    act = fitted.activity_scores()
    assert float(act[1]) > float(act[0])
    assert float(act[1]) > float(act[2])


def test_active_ss_svd_path_matches_evd():
    x, y = _aniso_fixture()
    est = PolyGradientEstimator(x, y, est_order=2, n_nbrs=14)
    ass = ActiveSsRsvd(est, 2)
    f_evd = ass.fit(x)
    f_svd = ass.fit_svd(x)
    # singular values of G/sqrt(N) squared == eigenvalues of G G^T / N
    evd_vals = np.diagonal(np.asarray(f_evd.singular_vals_))[:2]
    svd_vals = np.diagonal(np.asarray(f_svd.singular_vals_))[:2] ** 2
    np.testing.assert_allclose(svd_vals, evd_vals, rtol=1e-6)
    # leading directions align up to sign
    for j in range(2):
        dot = abs(
            float(
                jnp.dot(f_evd.components[:, j], f_svd.components[:, j])
            )
        )
        assert dot > 1.0 - 1e-6


def test_active_ss_public_surface():
    # README demo shape check (readme.md:104-110): x (1000, 10) order 1.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1000, 10)))
    y = jnp.asarray(rng.standard_normal((1000, 1)))
    comps, vals, sensi = crt.active_ss(x, y, 1, 30, 8)
    assert comps.shape == (10, 8)
    assert vals.shape == (10, 8)
    assert sensi.shape == (10,)


def test_native_backend_matches_device(rng):
    from corrla_rs_tpu import native
    from corrla_rs_tpu.models.active_subspaces import (
        ActiveSsRsvd,
        PolyGradientEstimator,
    )

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    x = rng.uniform(-1.0, 1.0, (400, 3))
    y = 0.1 * x[:, 0] + 5.0 * x[:, 1] + 0.3 * x[:, 2]
    ge_d = PolyGradientEstimator(jnp.asarray(x), jnp.asarray(y), 1, 12)
    ge_n = PolyGradientEstimator(jnp.asarray(x), jnp.asarray(y), 1, 12,
                                 backend="native")
    g_d = np.asarray(ge_d.grad_batch(jnp.asarray(x[:50])))
    g_n = np.asarray(ge_n.grad_batch(jnp.asarray(x[:50])))
    # identical neighborhoods (exact kNN both ways) -> identical fits
    np.testing.assert_allclose(g_n, g_d, rtol=1e-8, atol=1e-10)
    f = ActiveSsRsvd(ge_n, 2).fit(jnp.asarray(x))
    assert int(np.abs(np.asarray(f.components)[:, 0]).argmax()) == 1


def test_fit_bootstrap_intervals(rng):
    from corrla_rs_tpu.models.active_subspaces import (
        ActiveSsRsvd,
        PolyGradientEstimator,
    )

    x = rng.uniform(-1.0, 1.0, (300, 3))
    y = 0.1 * x[:, 0] + 5.0 * x[:, 1] + 0.3 * x[:, 2]
    ge = PolyGradientEstimator(jnp.asarray(x), jnp.asarray(y), 1, 12)
    est = ActiveSsRsvd(ge, 1)
    out = est.fit_bootstrap(jnp.asarray(x), n_boot=64, key=5)
    eigs = np.asarray(out["eigs"])
    lo, hi = np.asarray(out["eig_lo"]), np.asarray(out["eig_hi"])
    # point estimates inside their own bootstrap bands
    assert (lo <= eigs + 1e-12).all() and (eigs <= hi + 1e-12).all()
    # the dominant eigenvalue is clearly separated from the rest
    assert lo[0] > hi[1]
    # the 1-D active subspace is stable under resampling (strong signal)
    d = np.asarray(out["subspace_dist"])
    assert d.shape == (64,)
    assert np.median(d) < 0.05


def test_grad_est_support_chunk_matches(rng):
    x = jnp.asarray(rng.standard_normal((200, 3)))
    y = (2.0 * x[:, 0] - 0.5 * x[:, 1] + 3.0)[:, None]
    est = PolyGradientEstimator(x, y, est_order=1, n_nbrs=10)
    est_c = PolyGradientEstimator(x, y, est_order=1, n_nbrs=10,
                                  query_chunk=16, support_chunk=64)
    g = np.asarray(est.grad_batch(x[:40]))
    g_c = np.asarray(est_c.grad_batch(x[:40]))
    np.testing.assert_allclose(g_c, g, rtol=1e-10)


def test_ad_gradient_estimator_exact_subspace():
    """Exact-AD gradients: the active subspace of a ridge function
    f(x) = g(w . x) is span(w) EXACTLY — no kNN/local-fit estimation
    error; the first eigenvalue carries all the variance."""
    import jax

    from corrla_rs_tpu.models.active_subspaces import (
        ActiveSsRsvd,
        AdGradientEstimator,
        PolyGradientEstimator,
    )

    w = jnp.asarray(np.array([3.0, -1.0, 0.5, 2.0]) / np.linalg.norm(
        [3.0, -1.0, 0.5, 2.0]))

    def f(x):
        z = jnp.dot(w, x)
        return jnp.sin(z) + 0.5 * z ** 2

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (400, 4)))
    est = AdGradientEstimator(f)
    fit = ActiveSsRsvd(est, n_comps=2).fit(x)
    lead = np.asarray(fit.components)[:, 0]
    align = abs(float(np.dot(lead, np.asarray(w))))
    assert align > 1.0 - 1e-12          # exact, not approximate
    vals = np.asarray(fit.singular_vals).ravel()
    assert vals[1] / vals[0] < 1e-10     # rank-1 gradient matrix

    # grad_at parity with the batch path
    g1 = np.asarray(est.grad_at(x[0]))
    gb = np.asarray(est.grad_batch(x[:1]))
    np.testing.assert_allclose(g1, gb, rtol=1e-14)

    # and the sampled-data estimator agrees with AD to its own accuracy
    y = jax.vmap(f)(x)
    poly = PolyGradientEstimator(x, y, est_order=2, n_nbrs=30)
    fit_p = ActiveSsRsvd(poly, n_comps=2).fit(x)
    lead_p = np.asarray(fit_p.components)[:, 0]
    assert abs(float(np.dot(lead_p, np.asarray(w)))) > 0.99
