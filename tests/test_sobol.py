"""Sobol' variance-based sensitivity (ops/sobol) — extension tests.

Oracle: the Ishigami function (a=7, b=0.1) with closed-form indices
    S1 = [0.3139, 0.4424, 0], ST = [0.5576, 0.4424, 0.2437]
(the standard benchmark of the Sobol'-index literature), plus a linear
function with an exact variance decomposition.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.sobol import saltelli_plan, sobol_indices

ISHI_BOUNDS = np.array([[-np.pi, np.pi]] * 3)


def _ishigami(x, a=7.0, b=0.1):
    return (
        jnp.sin(x[:, 0])
        + a * jnp.sin(x[:, 1]) ** 2
        + b * x[:, 2] ** 4 * jnp.sin(x[:, 0])
    )


def _ishigami_exact(a=7.0, b=0.1):
    pi4 = np.pi ** 4
    v1 = 0.5 * (1 + b * pi4 / 5) ** 2
    v2 = a ** 2 / 8
    v13 = b ** 2 * pi4 ** 2 * (1.0 / 18 - 1.0 / 50)
    v = v1 + v2 + v13
    s1 = np.array([v1 / v, v2 / v, 0.0])
    st = np.array([(v1 + v13) / v, v2 / v, v13 / v])
    return s1, st


@pytest.mark.parametrize("plan,tol", [("uniform", 0.05), ("sobol", 0.01)])
def test_ishigami_indices(plan, tol):
    out = sobol_indices(_ishigami, ISHI_BOUNDS, 8192, key=0, plan=plan)
    s1_ref, st_ref = _ishigami_exact()
    np.testing.assert_allclose(np.asarray(out["s1"]), s1_ref, atol=tol)
    np.testing.assert_allclose(np.asarray(out["st"]), st_ref, atol=tol)


def test_linear_function_exact_decomposition():
    # f = 2 x1 + 1 x2 over unit cube: V_i = c_i^2 / 12, no interactions
    bounds = np.array([[0.0, 1.0], [0.0, 1.0]])

    def f(x):
        return 2.0 * x[:, 0] + 1.0 * x[:, 1]

    out = sobol_indices(f, bounds, 16384, key=1, plan="sobol")
    ref = np.array([4.0, 1.0]) / 5.0
    np.testing.assert_allclose(np.asarray(out["s1"]), ref, atol=0.01)
    np.testing.assert_allclose(np.asarray(out["st"]), ref, atol=0.01)
    np.testing.assert_allclose(float(out["var"]), 5.0 / 12.0, rtol=0.02)


@pytest.mark.slow
def test_bootstrap_bands_cover_point_estimates():
    out = sobol_indices(
        _ishigami, ISHI_BOUNDS, 4096, key=2, plan="sobol", n_boot=128
    )
    s1 = np.asarray(out["s1"])
    assert (np.asarray(out["s1_lo"]) <= s1 + 1e-12).all()
    assert (s1 <= np.asarray(out["s1_hi"]) + 1e-12).all()
    # the known-zero S1 of x3's band contains 0
    assert float(out["s1_lo"][2]) <= 0.0 <= float(out["s1_hi"][2]) + 0.02


def test_saltelli_plan_structure():
    bounds = np.array([[0.0, 1.0], [-1.0, 2.0], [5.0, 6.0]])
    a, b, ab = saltelli_plan(bounds, 100, key=3)
    assert a.shape == (100, 3) and b.shape == (100, 3)
    assert ab.shape == (3, 100, 3)
    a_np, b_np, ab_np = map(np.asarray, (a, b, ab))
    for i in range(3):
        # column i comes from B, the rest from A
        np.testing.assert_array_equal(ab_np[i][:, i], b_np[:, i])
        keep = [j for j in range(3) if j != i]
        np.testing.assert_array_equal(ab_np[i][:, keep], a_np[:, keep])
    # bounds respected
    for j in range(3):
        assert a_np[:, j].min() >= bounds[j, 0]
        assert a_np[:, j].max() <= bounds[j, 1]


def test_vectorization_validation():
    with pytest.raises(ValueError, match="vectorized"):
        sobol_indices(
            lambda x: jnp.sum(x), np.array([[0.0, 1.0]] * 2), 64, key=4
        )
