"""SINDy oracle tests: exact recovery of known governing equations.

Oracle style follows the reference's synthetic-physics fixtures
(SURVEY.md §4): simulate a known system, identify, compare against the
closed-form coefficients and forward predictions.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.models.sindy import (
    Sindy,
    evaluate_library,
    polynomial_exponents,
)

SIGMA, RHO, BETA = 10.0, 28.0, 8.0 / 3.0


def lorenz_rhs(x):
    return jnp.stack([
        SIGMA * (x[..., 1] - x[..., 0]),
        x[..., 0] * (RHO - x[..., 2]) - x[..., 1],
        x[..., 0] * x[..., 1] - BETA * x[..., 2],
    ], axis=-1)


def simulate_rk4(rhs, x0, dt, n_steps):
    import jax
    from jax import lax

    def step(x, _):
        k1 = rhs(x)
        k2 = rhs(x + 0.5 * dt * k1)
        k3 = rhs(x + 0.5 * dt * k2)
        k4 = rhs(x + dt * k3)
        xn = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return xn, xn

    x0 = jnp.asarray(x0, jnp.float64)
    _, traj = jax.jit(lambda x: lax.scan(step, x, None, length=n_steps))(x0)
    return jnp.concatenate([x0[None], traj], axis=0)


@pytest.fixture(scope="module")
def lorenz_traj():
    dt = 0.002
    x = simulate_rk4(lorenz_rhs, jnp.array([-8.0, 8.0, 27.0]), dt, 4000)
    return x, dt


def _lorenz_true_coeffs(names):
    """Expected (feature -> coeff) per state dim for the Lorenz system."""
    truth = [
        {"x0": -SIGMA, "x1": SIGMA},
        {"x0": RHO, "x1": -1.0, "x0 x2": -1.0},
        {"x2": -BETA, "x0 x1": 1.0},
    ]
    idx = {nm: j for j, nm in enumerate(names)}
    return truth, idx


def test_library_shapes_and_values():
    e = polynomial_exponents(2, 2)
    # 1, x0, x1, x0^2, x0 x1, x1^2
    assert e.shape == (6, 2)
    x = jnp.array([[2.0, 3.0]])
    th = evaluate_library(x, e)
    np.testing.assert_allclose(
        np.asarray(th[0]), [1.0, 2.0, 3.0, 4.0, 6.0, 9.0])
    th_trig = evaluate_library(x, e, trig_freqs=1)
    assert th_trig.shape == (1, 6 + 4)
    np.testing.assert_allclose(
        np.asarray(th_trig[0, 6:]),
        [np.sin(2.0), np.sin(3.0), np.cos(2.0), np.cos(3.0)], rtol=1e-12)


def test_lorenz_exact_derivatives(lorenz_traj):
    x, _ = lorenz_traj
    model = Sindy(degree=2, threshold=0.5, ridge=0.0).fit(
        x, x_dot=lorenz_rhs(x))
    truth, idx = _lorenz_true_coeffs(model.feature_names_)
    w = np.asarray(model.coefficients_)
    for dim, terms in enumerate(truth):
        for nm in model.feature_names_:
            expect = terms.get(nm, 0.0)
            got = w[idx[nm], dim]
            assert got == pytest.approx(expect, abs=2e-4), (dim, nm)
    assert model.score(x, x_dot=lorenz_rhs(x)) > 1.0 - 1e-10


def test_lorenz_fd_derivatives_and_forecast(lorenz_traj):
    x, dt = lorenz_traj
    model = Sindy(degree=2, threshold=0.5).fit(x, dt=dt)
    truth, idx = _lorenz_true_coeffs(model.feature_names_)
    w = np.asarray(model.coefficients_)
    # support must be exact; coefficients within FD error
    for dim, terms in enumerate(truth):
        for nm in model.feature_names_:
            expect = terms.get(nm, 0.0)
            got = w[idx[nm], dim]
            if expect == 0.0:
                assert got == 0.0, (dim, nm)
            else:
                assert got == pytest.approx(expect, rel=2e-3), (dim, nm)
    # short-horizon forecast tracks the true trajectory
    pred = model.simulate(x[0], 250, dt=dt)
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(x[:251]), atol=5e-2)


def test_sindy_with_control():
    # forced linear system: x0' = -0.5 x0 + 2 u(t), x1' = 1.5 x0 - 0.7 x1
    # with u(t) = sin(2t) evaluated CONTINUOUSLY at RK4 substeps, so the
    # sampled trajectory satisfies the ODE at the sample times and the
    # finite-difference derivatives are O(dt^2)-clean.
    dt = 0.01
    n = 3000
    t = np.arange(n) * dt
    u = np.sin(2.0 * t)[:, None]

    def rhs(x, tt):
        uu = jnp.sin(2.0 * tt)
        return jnp.stack([
            -0.5 * x[..., 0] + 2.0 * uu,
            1.5 * x[..., 0] - 0.7 * x[..., 1],
        ], axis=-1)

    import jax
    from jax import lax

    def step(x, tk):
        k1 = rhs(x, tk)
        k2 = rhs(x + 0.5 * dt * k1, tk + 0.5 * dt)
        k3 = rhs(x + 0.5 * dt * k2, tk + 0.5 * dt)
        k4 = rhs(x + dt * k3, tk + dt)
        xn = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return xn, xn

    x0 = jnp.array([1.0, -1.0], dtype=jnp.float64)
    _, traj = jax.jit(lambda z: lax.scan(step, z, jnp.asarray(t[:-1])))(x0)
    x = jnp.concatenate([x0[None], traj], axis=0)

    model = Sindy(degree=2, threshold=0.1).fit(x, u=u, dt=dt)
    idx = {nm: j for j, nm in enumerate(model.feature_names_)}
    w = np.asarray(model.coefficients_)
    assert w[idx["x0"], 0] == pytest.approx(-0.5, rel=1e-2)
    assert w[idx["u0"], 0] == pytest.approx(2.0, rel=1e-2)
    assert w[idx["x0"], 1] == pytest.approx(1.5, rel=1e-2)
    assert w[idx["x1"], 1] == pytest.approx(-0.7, rel=1e-2)
    # everything else pruned
    nnz = int(np.count_nonzero(w))
    assert nnz == 4
    # rollout (zero-order-hold u, hence the looser tolerance vs truth)
    pred = model.simulate(x[0], 200, dt=dt, u=jnp.asarray(u))
    np.testing.assert_allclose(
        np.asarray(pred), np.asarray(x[:201]), atol=5e-2)


def test_discrete_logistic_map():
    r = 3.6
    xs = [0.4]
    for _ in range(600):
        xs.append(r * xs[-1] * (1.0 - xs[-1]))
    x = jnp.asarray(xs, jnp.float64)[:, None]
    model = Sindy(degree=2, threshold=0.2, ridge=0.0, discrete=True).fit(x)
    idx = {nm: j for j, nm in enumerate(model.feature_names_)}
    w = np.asarray(model.coefficients_)
    assert w[idx["x0"], 0] == pytest.approx(r, abs=1e-8)
    assert w[idx["x0^2"], 0] == pytest.approx(-r, abs=1e-8)
    assert int(np.count_nonzero(w)) == 2
    pred = model.simulate(x[0], 5)
    np.testing.assert_allclose(np.asarray(pred[1:, 0]),
                               np.asarray(x[1:6, 0]), atol=1e-8)


def test_noise_robustness_support_recovery(lorenz_traj):
    x, dt = lorenz_traj
    rng = np.random.default_rng(0)
    xn = x + 1e-3 * rng.standard_normal(x.shape)
    model = Sindy(degree=2, threshold=0.5, ridge=1e-8).fit(
        jnp.asarray(xn), dt=dt)
    truth, idx = _lorenz_true_coeffs(model.feature_names_)
    w = np.asarray(model.coefficients_)
    for dim, terms in enumerate(truth):
        active = {nm for nm, j in idx.items() if w[j, dim] != 0.0}
        assert active == set(terms), dim
        for nm, expect in terms.items():
            assert w[idx[nm], dim] == pytest.approx(expect, rel=5e-2)


def test_checkpoint_roundtrip(tmp_path, lorenz_traj):
    from corrla_rs_tpu.utils.checkpoint import load_model, save_model

    x, dt = lorenz_traj
    model = Sindy(degree=2, threshold=0.5).fit(x, dt=dt)
    p = str(tmp_path / "sindy.npz")
    save_model(p, model)
    back = load_model(p)
    np.testing.assert_array_equal(
        np.asarray(back.coefficients_), np.asarray(model.coefficients_))
    assert back.feature_names_ == model.feature_names_
    np.testing.assert_allclose(
        np.asarray(back.simulate(x[0], 50, dt=dt)),
        np.asarray(model.simulate(x[0], 50, dt=dt)), rtol=1e-12)


@pytest.mark.slow
def test_errors():
    x = jnp.zeros((10, 2))
    with pytest.raises(ValueError, match="fit"):
        Sindy().predict(x)
    with pytest.raises(ValueError, match="discrete"):
        Sindy(discrete=True).fit(x, x_dot=x)
    m = Sindy(degree=1, threshold=0.0).fit(
        jnp.asarray(np.random.default_rng(1).standard_normal((50, 2))),
        u=np.ones((50, 1)), dt=0.1)
    with pytest.raises(ValueError, match="control"):
        m.predict(x)
    with pytest.raises(ValueError, match="control"):
        m.simulate(x[0], 5, dt=0.1)


def test_trig_feature_names_match_columns():
    """Regression (review r4): with trig_freqs >= 2 the name list must
    follow evaluate_library's column order — ALL sin blocks (k-major),
    then all cos blocks."""
    x = jnp.asarray(np.linspace(0.1, 1.0, 50))[:, None]
    m = Sindy(degree=1, threshold=0.0, ridge=0.0, trig_freqs=2)
    m.fit(x, x_dot=jnp.cos(2.0 * x))  # d/dt target = cos(2 x0)
    idx = {nm: j for j, nm in enumerate(m.feature_names_)}
    assert m.feature_names_[-4:] == [
        "sin(1 x0)", "sin(2 x0)", "cos(1 x0)", "cos(2 x0)"]
    # the coefficient named cos(2 x0) is the one that's ~1
    w = np.asarray(m.coefficients_)
    assert abs(w[idx["cos(2 x0)"], 0] - 1.0) < 1e-6
    assert abs(w[idx["cos(1 x0)"], 0]) < 1e-6


def test_library_gradient_finite_at_zero():
    """Regression (review r4): d/dx of the monomial library must be
    finite at exact zeros (0**0 branch needs its INPUT guarded too)."""
    import jax

    e = polynomial_exponents(2, 2)
    g = jax.grad(lambda x: jnp.sum(evaluate_library(x[None], e)))(
        jnp.array([0.0, 1.0]))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_weak_form_noise_robust(lorenz_traj):
    """WSINDy: with heavy measurement noise the weak form recovers the
    Lorenz support and coefficients where FD-based SINDy degrades —
    the data is integrated, never differentiated."""
    x, dt = lorenz_traj
    rng = np.random.default_rng(5)
    xn = jnp.asarray(x + 0.25 * rng.standard_normal(x.shape))

    weak = Sindy(degree=2, threshold=0.5).fit(
        xn, dt=dt, weak=True, n_windows=150, window_frac=0.3)
    strong = Sindy(degree=2, threshold=0.5).fit(xn, dt=dt)
    truth, idx = _lorenz_true_coeffs(weak.feature_names_)

    def max_rel_err(model):
        w = np.asarray(model.coefficients_)
        errs = []
        for dim, terms in enumerate(truth):
            for nm, expect in terms.items():
                errs.append(abs(w[idx[nm], dim] - expect) / abs(expect))
        return max(errs)

    # weak support exact; coefficients within a few percent
    w = np.asarray(weak.coefficients_)
    for dim, terms in enumerate(truth):
        active = {nm for nm, j in idx.items() if w[j, dim] != 0.0}
        assert active == set(terms), dim
    assert max_rel_err(weak) < 0.05
    # and clearly better than differentiating the noise
    assert max_rel_err(weak) < 0.5 * max_rel_err(strong)


def test_weak_form_matches_strong_on_clean_data(lorenz_traj):
    x, dt = lorenz_traj
    weak = Sindy(degree=2, threshold=0.5).fit(x, dt=dt, weak=True)
    truth, idx = _lorenz_true_coeffs(weak.feature_names_)
    w = np.asarray(weak.coefficients_)
    for dim, terms in enumerate(truth):
        for nm, expect in terms.items():
            assert w[idx[nm], dim] == pytest.approx(expect, rel=5e-3), nm
    with pytest.raises(ValueError, match="continuous"):
        Sindy(discrete=True).fit(x, weak=True)
    with pytest.raises(ValueError, match="x_dot"):
        Sindy().fit(x, x_dot=x, weak=True)


def test_weak_form_short_trajectory_guard():
    """Regression (review): a trajectory too short for distinct windows
    must raise, not return a rank-1 garbage fit."""
    x = jnp.asarray(np.random.default_rng(9).standard_normal((11, 2)))
    with pytest.raises(ValueError, match="rank-1"):
        Sindy(degree=1).fit(x, dt=0.1, weak=True, n_windows=50)
