"""Native host runtime tests (C++ rejection sampler + kd-tree)."""
import numpy as np
import pytest

from corrla_rs_tpu import native

BOUNDS = np.array([[0.0, 0.0026], [0.1955, 0.1995], [0.80, 0.825]])

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host runtime not built"
)


def test_host_rejection_sampler():
    s = native.cs_dirichlet_rejection_host(
        BOUNDS, 100, max_zshots=500, chunk_size=1_000_000, c_scale=1.0,
        alphas=np.ones(3), seed=1,
    )
    assert s.shape == (100, 3)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-12)
    assert (s >= BOUNDS[:, 0][None, :]).all()
    assert (s <= BOUNDS[:, 1][None, :]).all()


def test_host_rejection_alpha_broadcast_and_scale():
    s = native.cs_dirichlet_rejection_host(
        BOUNDS * 2.0, 50, 500, 1_000_000, c_scale=2.0, alphas=[1.0], seed=2
    )
    np.testing.assert_allclose(s.sum(axis=1), 2.0, atol=1e-12)


def test_host_rejection_infeasible_raises():
    impossible = np.array([[0.9, 1.0], [0.9, 1.0], [0.9, 1.0]])
    with pytest.raises(RuntimeError):
        native.cs_dirichlet_rejection_host(
            impossible, 10, 2, 10_000, 1.0, np.ones(3), seed=3
        )


def test_host_rejection_nonuniform_alphas():
    # statistical check: alpha=(5,1,1) biases mass toward dim 0
    wide = np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
    s = native.cs_dirichlet_rejection_host(
        wide, 20000, 10, 100_000, 1.0, [5.0, 1.0, 1.0], seed=4
    )
    means = s.mean(axis=0)
    np.testing.assert_allclose(means, [5 / 7, 1 / 7, 1 / 7], atol=2e-2)


def test_kdtree_matches_bruteforce(rng):
    pts = rng.standard_normal((5000, 4))
    qs = rng.standard_normal((64, 4))
    tree = native.KdTreeHost(pts)
    d, idx = tree.query(qs, 8)
    d_bf = np.linalg.norm(qs[:, None, :] - pts[None, :, :], axis=-1)
    idx_bf = np.argsort(d_bf, axis=1)[:, :8]
    np.testing.assert_array_equal(idx, idx_bf)
    np.testing.assert_allclose(d, np.sort(d_bf, axis=1)[:, :8], rtol=1e-12)


def test_kdtree_matches_device_knn(rng):
    import jax.numpy as jnp

    from corrla_rs_tpu.ops.knn import knn

    pts = rng.standard_normal((800, 3))
    qs = rng.standard_normal((10, 3))
    tree = native.KdTreeHost(pts)
    d_h, i_h = tree.query(qs, 5)
    d_d, i_d = knn(jnp.asarray(qs), jnp.asarray(pts), 5)
    np.testing.assert_array_equal(i_h, np.asarray(i_d))
    np.testing.assert_allclose(d_h, np.asarray(d_d), rtol=1e-6)


def test_kendall_tau_knight_matches_device(rng):
    from corrla_rs_tpu import native
    from corrla_rs_tpu.ops.vine import kendall_tau

    if not native.available():
        import pytest

        pytest.skip("native runtime unavailable")
    x = rng.standard_normal(3000)
    y = 0.6 * x + 0.8 * rng.standard_normal(3000)
    t_dev = float(kendall_tau(x, y, method="device"))
    t_host = native.kendall_tau_host(x, y)
    assert abs(t_dev - t_host) < 1e-9
    # ties handled (tau-b numerator / tau-a denominator, like the device
    # sign-product mean which scores tied pairs 0)
    xi = np.repeat(np.arange(60.0), 4)
    yi = xi.copy()
    t = native.kendall_tau_host(xi, yi)
    t_dev2 = float(kendall_tau(xi, yi, method="device"))
    assert abs(t - t_dev2) < 1e-9
    # large-n auto dispatch picks the host path and agrees statistically
    n = 60_000
    xb = rng.standard_normal(n)
    yb = 0.5 * xb + np.sqrt(1 - 0.25) * rng.standard_normal(n)
    tau_big = float(kendall_tau(xb, yb, method="auto"))
    import math

    expected = 2.0 / math.pi * math.asin(0.5)  # Greiner's relation
    assert abs(tau_big - expected) < 0.01
