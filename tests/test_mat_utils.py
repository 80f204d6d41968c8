"""mat_utils parity tests (oracles from reference mat_utils.rs:636-965)."""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.ops import mat_utils as mu
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def test_pinv_2x4():
    # Oracle from reference mat_utils.rs:751-775: pinv of a full-rank 2x4.
    a = jnp.array([[1.0, 2.0, 3.0, 4.0], [5.0, 6.0, 7.0, 8.0]])
    a_pinv = mu.pinv(a)
    assert a_pinv.shape == (4, 2)
    # A @ A+ @ A == A for a full-row-rank matrix. The eps-regularized form
    # (1/(s+eps), parity with mat_utils.rs:44-51) limits accuracy to ~1e-7.
    assert_mat_approx_eq(a @ a_pinv @ a, a, 1e-6)
    assert_mat_approx_eq(a @ a_pinv, jnp.eye(2), 1e-6)


def test_pinv_matches_numpy_on_full_rank(rng):
    a = jnp.asarray(rng.standard_normal((8, 5)))
    assert_mat_approx_eq(mu.pinv(a), np.linalg.pinv(np.asarray(a)), 1e-6)


def test_pinv_diag():
    d = jnp.diag(jnp.array([2.0, 0.0, 4.0]))
    d_inv = mu.pinv_diag(d)
    assert_mat_approx_eq(d_inv, jnp.diag(jnp.array([0.5, 0.0, 0.25])), 1e-10)


def test_truncated_svd(rng):
    a = jnp.asarray(rng.standard_normal((20, 8)))
    u, s, vt = mu.truncated_svd(a, 3)
    assert u.shape == (20, 3) and s.shape == (3,) and vt.shape == (3, 8)
    su, ss, svt = np.linalg.svd(np.asarray(a), full_matrices=False)
    assert_mat_approx_eq(s, ss[:3], 1e-10)


def test_sort_evd():
    # Parity with reference sort_evd (mat_utils.rs:459-478): descending by
    # value, eigenvector columns reordered in lockstep.
    eigs = jnp.diag(jnp.array([1.0, 3.0, 2.0]))
    vecs = jnp.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    s_e, s_v = mu.sort_evd(eigs, vecs)
    assert_mat_approx_eq(jnp.diagonal(s_e), jnp.array([3.0, 2.0, 1.0]))
    assert_mat_approx_eq(s_v[:, 0], jnp.array([2.0, 5.0, 8.0]))
    assert_mat_approx_eq(s_v[:, 2], jnp.array([1.0, 4.0, 7.0]))
    # 1-D eigenvalue input accepted too
    s_e2, _ = mu.sort_evd(jnp.array([1.0, 3.0, 2.0]), vecs)
    assert_mat_approx_eq(s_e, s_e2)


def test_center_and_zcenter(rng):
    x = jnp.asarray(rng.standard_normal((100, 4)) * 3.0 + 5.0)
    c = mu.center_mat_col(x)
    assert_mat_approx_eq(jnp.mean(c, axis=0), jnp.zeros(4), 1e-10)
    z = mu.zcenter_mat_col(x)
    assert_mat_approx_eq(jnp.mean(z, axis=0), jnp.zeros(4), 1e-10)
    assert_mat_approx_eq(jnp.std(z, axis=0, ddof=1), jnp.ones(4), 1e-10)


def test_mat_linspace_reference_quirk():
    # Parity with mat_utils.rs:600-610: ignores start offset, excludes end.
    out = mu.mat_linspace(0.0, 10.0, 5)
    assert out.shape == (5, 1)
    assert_mat_approx_eq(out[:, 0], jnp.array([0.0, 2.0, 4.0, 6.0, 8.0]), 1e-12)


def test_complex_round_trip(rng):
    re = jnp.asarray(rng.standard_normal((3, 3)))
    im = jnp.asarray(rng.standard_normal((3, 3)))
    c = mu.complex_from_parts(re, im)
    r2, i2 = mu.parts_from_complex(c)
    assert_mat_approx_eq(r2, re)
    assert_mat_approx_eq(i2, im)
