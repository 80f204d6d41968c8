"""Quadrature: polynomial exactness + smooth-integrand convergence."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.quadrature import (
    clenshaw_curtis,
    gauss_hermite,
    gauss_legendre,
    integrate,
    smolyak_quadrature,
    tensor_quadrature,
)


def test_gauss_legendre_exactness():
    r = gauss_legendre(5)  # exact through degree 9
    for deg in range(10):
        got = integrate(lambda x, d=deg: x[0] ** d, r)
        truth = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert got == pytest.approx(truth, abs=1e-13), deg
    # interval mapping
    r2 = gauss_legendre(4, 1.0, 3.0)
    assert integrate(lambda x: x[0] ** 2, r2) == pytest.approx(26 / 3)


def test_gauss_hermite_normal_moments():
    r = gauss_hermite(8)
    for deg, truth in ((0, 1.0), (2, 1.0), (4, 3.0), (6, 15.0),
                       (1, 0.0), (3, 0.0)):
        got = integrate(lambda x, d=deg: x[0] ** d, r)
        assert got == pytest.approx(truth, abs=1e-10), deg


def test_clenshaw_curtis_exactness_and_nesting():
    r = clenshaw_curtis(9)  # exact through degree 8
    for deg in range(9):
        got = integrate(lambda x, d=deg: x[0] ** d, r)
        truth = (1 - (-1) ** (deg + 1)) / (deg + 1)
        assert got == pytest.approx(truth, abs=1e-12), deg
    # nesting: level-k node sets contain level-(k-1)'s
    n5 = np.sort(clenshaw_curtis(5).nodes.ravel())
    n9 = np.sort(clenshaw_curtis(9).nodes.ravel())
    assert all(np.min(np.abs(n9 - v)) < 1e-14 for v in n5)
    assert integrate(lambda x: jnp.exp(x[0]), clenshaw_curtis(17)) == \
        pytest.approx(np.e - 1 / np.e, rel=1e-12)


def test_tensor_grid():
    r = tensor_quadrature([gauss_legendre(4), gauss_legendre(3)])
    assert r.nodes.shape == (12, 2)
    got = integrate(lambda x: x[0] ** 2 * x[1] ** 4, r)
    assert got == pytest.approx((2 / 3) * (2 / 5), abs=1e-13)


def test_smolyak_polynomial_exactness():
    """Level-l CC Smolyak integrates all total-degree <= 2l+1 monomials
    exactly (classic result); checked numerically in d=4, level 2."""
    r = smolyak_quadrature(4, 2)

    def mono_truth(p):
        return np.prod([(1 - (-1) ** (pi + 1)) / (pi + 1) for pi in p])

    rng = np.random.default_rng(0)
    for _ in range(15):
        p = rng.multinomial(5, np.ones(4) / 4)  # total degree 5 = 2l+1
        got = integrate(
            lambda x, pw=jnp.asarray(p * 1.0): jnp.prod(x ** pw), r)
        assert got == pytest.approx(mono_truth(p), abs=1e-10), p


def test_smolyak_beats_tensor_point_count():
    """d=8: the level-3 sparse grid is orders of magnitude below the
    equivalent-resolution tensor grid (9^8 ~ 4.3e7 points)."""
    r = smolyak_quadrature(8, 3)
    assert r.nodes.shape[0] < 5000
    # smooth Genz oscillatory integrand: known closed form
    c = np.full(8, 0.3)

    def f(x):
        return jnp.cos(0.5 + jnp.dot(jnp.asarray(c), x))

    # closed form: Re[e^{i 0.5} prod_j (2 sin(c_j)/c_j)] (interval [-1,1])
    truth = np.cos(0.5) * np.prod(2 * np.sin(c) / c)
    got = integrate(f, r)
    # measured level-3 accuracy on this integrand: ~2e-6 relative
    assert got == pytest.approx(truth, rel=1e-5)


def test_smolyak_gauss_hermite():
    """Sparse Gauss-Hermite: mixed Gaussian moments in d=5."""
    r = smolyak_quadrature(5, 2, rule="gauss_hermite")
    got = integrate(lambda x: x[0] ** 2 * x[1] ** 2, r)
    assert got == pytest.approx(1.0, abs=1e-8)
    got4 = integrate(lambda x: x[2] ** 4, r)
    assert got4 == pytest.approx(3.0, abs=1e-8)


def test_validation():
    with pytest.raises(ValueError, match="rule"):
        smolyak_quadrature(2, 1, rule="nope")
    with pytest.raises(ValueError, match="level"):
        smolyak_quadrature(2, -1)


def test_integrate_plain_python_callable():
    """Regression (review): non-jax callables take the eager fallback."""
    import math

    r = gauss_legendre(6)
    got = integrate(lambda x: math.cos(float(x[0])), r)
    assert got == pytest.approx(2 * np.sin(1.0), rel=1e-10)
