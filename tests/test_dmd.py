"""DMDc parity tests (fixture from reference dmd_rom.rs:228-311)."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.models.dmd import DMDc
from corrla_rs_tpu.ops.eig import eig
from corrla_rs_tpu.ops.mat_utils import mat_linspace
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def _sine_fixture(nx, nt):
    # Forced sine field with exponentially growing control,
    # parity with dmd_rom.rs:243-267.
    x = mat_linspace(0.0, 10.0, nx)[:, 0]
    t = mat_linspace(0.0, 10.0, nt)[:, 0]
    u = jnp.exp(0.2 * t)[None, :]                      # (1, nt)
    p = jnp.sin(x[:, None] + 0.2 * t[None, :]) * u     # (nx, nt)
    return p, u


@pytest.mark.parametrize("nx,nt", [(20, 40), (50, 40), (200, 40)])
def test_dmdc_prediction(nx, nt):
    p, u = _sine_fixture(nx, nt)
    model = DMDc(p, u, n_modes=14, n_iters=40)

    a_op = model.est_a_til()
    b_op = model.est_b_til()
    assert a_op.shape == (nx, nx)
    assert b_op.shape == (nx, 1)
    assert model.lambdas.shape == (14,)

    x0 = p[:, 0:1]
    pred = model.predict_multiple(x0, u)
    # 20th snapshot vs 19th prediction (0th state was the IC), tol 5e-2
    # matching dmd_rom.rs:309.
    assert_mat_approx_eq(pred[:, 19:20], p[:, 20:21], 5e-2)


def test_dmdc_single_step_matches_rollout():
    p, u = _sine_fixture(20, 40)
    model = DMDc(p, u, n_modes=14, n_iters=40)
    x0 = p[:, 0:1]
    one = model.predict(x0, u[:, 0:1])
    many = model.predict_multiple(x0, u)
    assert_mat_approx_eq(one[:, 0], many[:, 0], 1e-9)


def test_eig_matches_numpy(rng):
    a = jnp.asarray(rng.standard_normal((12, 12)))
    vals, vecs = eig(a)
    vals_np = np.linalg.eigvals(np.asarray(a))
    # compare as sorted complex sets
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(vals)), np.sort_complex(vals_np), rtol=1e-9
    )
    # eigen equation holds
    resid = np.asarray(a) @ np.asarray(vecs) - np.asarray(vecs) * np.asarray(
        vals
    )
    assert np.abs(resid).max() < 1e-9


def test_eig_under_jit(rng):
    import jax

    a = jnp.asarray(rng.standard_normal((6, 6)))
    vals, _ = jax.jit(eig)(a)
    vals_np = np.linalg.eigvals(np.asarray(a))
    np.testing.assert_allclose(
        np.sort_complex(np.asarray(vals)), np.sort_complex(vals_np), rtol=1e-9
    )


def test_factored_rollout_matches_dense():
    p, u = _sine_fixture(50, 40)
    model = DMDc(p, u, n_modes=14, n_iters=40)
    x0 = p[:, 0:1]
    dense = model.predict_multiple(x0, u)
    fact = model.predict_multiple(x0, u, method="modes")
    assert_mat_approx_eq(fact, dense, 1e-6)


def test_dmdc_multiple_control_inputs():
    # n_u = 2 control rows (the reference supports arbitrary n_u,
    # dmd_rom.rs:49). The snapshot family has numerical rank 2, so the
    # well-posed fit uses n_modes <= rank; the over-parameterized fit must
    # stay bounded (the reference's additive-eps complex pinv explodes to
    # 1e26+ there — our rank-cutoff pinv keeps it finite).
    nx, nt = 40, 50
    x = np.linspace(0, 10, nx)
    t = np.linspace(0, 10, nt)
    u = np.stack([np.exp(0.15 * t), np.sin(0.5 * t) + 2.0])  # (2, nt)
    snaps = (
        np.sin(x[:, None] + 0.2 * t[None, :]) * u[0][None, :]
        + 0.3 * np.cos(x[:, None]) * u[1][None, :]
    )
    model = DMDc(jnp.asarray(snaps), jnp.asarray(u), 4, 30)
    assert model.n_u == 2
    assert model.est_b_til().shape == (nx, 2)
    x0 = jnp.asarray(snaps[:, 0:1])
    pred = model.predict_multiple(x0, jnp.asarray(u))
    assert_mat_approx_eq(pred[:, 19:20], snaps[:, 20:21], 5e-2)

    over = DMDc(jnp.asarray(snaps), jnp.asarray(u), 12, 30)
    pred_over = over.predict_multiple(x0, jnp.asarray(u))
    assert bool(jnp.all(jnp.isfinite(pred_over)))
    assert float(jnp.max(jnp.abs(pred_over))) < 1e3  # bounded, no blow-up
