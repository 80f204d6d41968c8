"""PCA parity tests (reference pca_rsvd.rs:115-135 + benchmark_pca.py)."""
import jax.numpy as jnp
import numpy as np

import corrla_rs_tpu as crt
from corrla_rs_tpu.models.pca import PcaRsvd
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def _mvn_data(rng, n=2000, d=8):
    cov = rng.uniform(0, 1, size=(d, d))
    cov = cov @ cov.T + np.eye(d)
    return jnp.asarray(rng.multivariate_normal(np.zeros(d), cov, size=n))


def test_pca_singular_values_match_exact(rng):
    x = _mvn_data(rng)
    pca = PcaRsvd(x, 4)
    xc = np.asarray(x) - np.asarray(x).mean(axis=0)
    s_exact = np.linalg.svd(xc, compute_uv=False)
    np.testing.assert_allclose(
        np.asarray(pca.singular_values), s_exact[:4], rtol=1e-6
    )


def test_pca_explained_var(rng):
    x = _mvn_data(rng)
    pca = PcaRsvd(x, 4)
    expect = np.asarray(pca.singular_values) ** 2 / (x.shape[0] - 1.0)
    assert_mat_approx_eq(pca.explained_var(), expect, 1e-8)


def test_pca_components_match_sklearn_directions(rng):
    # Components span the same directions as exact PCA (up to sign).
    x = _mvn_data(rng)
    pca = PcaRsvd(x, 4)
    xc = np.asarray(x) - np.asarray(x).mean(axis=0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    for i in range(4):
        dot = abs(float(np.dot(np.asarray(pca.components)[i], vt[i])))
        assert dot > 1.0 - 1e-8


def test_pca_transform_round_trip(rng):
    # Full-rank PCA: inv_transform(transform(x)) == x.
    x = _mvn_data(rng, n=500, d=5)
    pca = PcaRsvd(x, 5)
    red = pca.apply_tr(x)
    assert red.shape == (500, 5)
    back = pca.apply_inv_tr(red)
    assert_mat_approx_eq(back, x, 1e-6)


def test_rpca_surface(rng):
    x = _mvn_data(rng)
    s, comps = crt.rpca(x, 4, 4, 6)
    assert s.shape == (4, 1)
    assert comps.shape == (4, x.shape[1])


def test_pca_f32_accuracy(rng):
    # North-star check: f32 PCA singular values within 1e-5 rel of f64.
    x = _mvn_data(rng)
    pca32 = PcaRsvd(x.astype(jnp.float32), 4, stabilize="always")
    pca64 = PcaRsvd(x, 4)
    np.testing.assert_allclose(
        np.asarray(pca32.singular_values, dtype=np.float64),
        np.asarray(pca64.singular_values),
        rtol=5e-5,
    )
