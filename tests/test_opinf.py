"""Operator inference: exact operator recovery + ROM forecast oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.models.opinf import OpInf, kron2_compressed

R = 3
NQ = R * (R + 1) // 2
RNG = np.random.default_rng(0)
C_TRUE = jnp.asarray(0.1 * RNG.standard_normal(R))
A_TRUE = jnp.asarray(-np.eye(R) + 0.2 * RNG.standard_normal((R, R)))
H_TRUE = jnp.asarray(0.3 * RNG.standard_normal((R, NQ)))


def rhs_true(z):
    return C_TRUE + A_TRUE @ z + H_TRUE @ kron2_compressed(z)


def test_kron2_features():
    x = jnp.array([2.0, 3.0, 5.0])
    np.testing.assert_allclose(
        np.asarray(kron2_compressed(x)),
        [4.0, 6.0, 10.0, 9.0, 15.0, 25.0])
    xb = jnp.stack([x, 2 * x])
    assert kron2_compressed(xb).shape == (2, 6)


def test_exact_operator_recovery_identity_basis():
    """Pure regression check: random states + analytic derivatives,
    identity basis -> operators recovered to regression accuracy."""
    z = jnp.asarray(RNG.uniform(-1, 1, (500, R)))
    zdot = jax.vmap(rhs_true)(z)
    m = OpInf(n_modes=R, reg_linear=1e-10, reg_quadratic=1e-10).fit(
        z, x_dot=zdot, basis=jnp.eye(R))
    np.testing.assert_allclose(np.asarray(m.c_), np.asarray(C_TRUE),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.a_), np.asarray(A_TRUE),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(m.h_), np.asarray(H_TRUE),
                               atol=1e-8)


def _simulate_reduced(z0, dt, n_steps):
    from jax import lax

    def step(z, _):
        k1 = rhs_true(z)
        k2 = rhs_true(z + 0.5 * dt * k1)
        k3 = rhs_true(z + 0.5 * dt * k2)
        k4 = rhs_true(z + dt * k3)
        zn = z + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return zn, zn

    _, traj = jax.jit(
        lambda z: lax.scan(step, z, None, length=n_steps))(z0)
    return jnp.concatenate([z0[None], traj], axis=0)


def test_rom_forecast_from_lifted_snapshots():
    """Snapshots living exactly in a 3-dim subspace of R^64: POD basis +
    learned quadratic ROM reproduce the full-state trajectory."""
    n_x, dt = 64, 0.005
    v, _ = np.linalg.qr(RNG.standard_normal((n_x, R)))
    v = jnp.asarray(v)
    z = _simulate_reduced(jnp.array([0.8, -0.5, 0.3]), dt, 800)
    x = z @ v.T                                   # (801, 64)

    m = OpInf(n_modes=R, reg_linear=1e-10, reg_quadratic=1e-8).fit(
        x, dt=dt, key=1)
    # basis spans the true subspace
    proj = np.asarray(m.basis_.T @ v)
    s = np.linalg.svd(proj, compute_uv=False)
    np.testing.assert_allclose(s, 1.0, atol=1e-8)
    # forecast from the initial full state tracks the truth
    pred = m.predict(x[0], 800, dt)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(x),
                               atol=5e-3)


@pytest.mark.slow
def test_with_control_input():
    """Forced linear-quadratic system: B recovered through the data."""
    b_true = jnp.asarray(RNG.standard_normal((R, 1)))
    z = jnp.asarray(RNG.uniform(-1, 1, (600, R)))
    u = jnp.asarray(RNG.uniform(-1, 1, (600, 1)))
    zdot = jax.vmap(rhs_true)(z) + u * b_true.T
    m = OpInf(n_modes=R, reg_linear=1e-10, reg_quadratic=1e-10).fit(
        z, x_dot=zdot, u=u, basis=jnp.eye(R))
    np.testing.assert_allclose(np.asarray(m.b_), np.asarray(b_true),
                               atol=1e-8)
    # rollout API with control runs
    traj = m.simulate_reduced(z[0], 10, 0.01, u=jnp.zeros((10, 1)))
    assert traj.shape == (11, R)


def test_model_form_flags():
    z = jnp.asarray(RNG.uniform(-1, 1, (300, R)))
    zdot = z @ np.asarray(A_TRUE).T               # pure linear data
    m = OpInf(n_modes=R, include_constant=False, include_quadratic=False,
              reg_linear=1e-12).fit(z, x_dot=zdot, basis=jnp.eye(R))
    np.testing.assert_allclose(np.asarray(m.a_), np.asarray(A_TRUE),
                               atol=1e-9)
    assert np.all(np.asarray(m.c_) == 0.0)
    assert np.all(np.asarray(m.h_) == 0.0)


def test_checkpoint_and_validation(tmp_path):
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    z = jnp.asarray(RNG.uniform(-1, 1, (200, R)))
    zdot = jax.vmap(rhs_true)(z)
    m = OpInf(n_modes=R).fit(z, x_dot=zdot, basis=jnp.eye(R))
    p = str(tmp_path / "opinf.npz")
    save_model(p, m)
    back = load_model(p)
    np.testing.assert_array_equal(np.asarray(back.a_), np.asarray(m.a_))
    t1 = m.simulate_reduced(z[0], 20, 0.01)
    t2 = back.simulate_reduced(z[0], 20, 0.01)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-12)

    with pytest.raises(ValueError, match="basis"):
        OpInf(n_modes=2).fit(z, basis=jnp.eye(R))
    with pytest.raises(ValueError, match="fit"):
        OpInf(n_modes=2).simulate_reduced(jnp.zeros(2), 5, 0.1)
    mm = OpInf(n_modes=R).fit(z, x_dot=zdot, u=jnp.ones((200, 1)),
                              basis=jnp.eye(R))
    with pytest.raises(ValueError, match="control"):
        mm.simulate_reduced(z[0], 5, 0.1)
