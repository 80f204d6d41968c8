"""Morris elementary-effects screening (ops/morris) — extension tests."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.morris import morris_screening, morris_trajectories


@pytest.mark.slow
def test_trajectory_structure():
    bounds = np.array([[0.0, 1.0], [-2.0, 2.0], [10.0, 20.0]])
    pts, signs, order = morris_trajectories(bounds, 16, key=0)
    assert pts.shape == (16, 4, 3)
    p = np.asarray(pts)
    # inside the box
    for j in range(3):
        assert p[:, :, j].min() >= bounds[j, 0] - 1e-12
        assert p[:, :, j].max() <= bounds[j, 1] + 1e-12
    # each step changes exactly one coordinate
    d = np.abs(np.diff(p, axis=1))
    changed = (d > 1e-12).sum(axis=2)
    np.testing.assert_array_equal(changed, np.ones((16, 3)))
    # over a full trajectory every coordinate moves exactly once
    o = np.asarray(order)
    assert all(sorted(row) == [0, 1, 2] for row in o)


def test_linear_function_exact_effects():
    # f = 3 x1 - 2 x2 + 0 x3: EE_i == c_i exactly for every trajectory
    bounds = np.array([[0.0, 1.0], [0.0, 2.0], [0.0, 1.0]])

    def f(x):
        return 3.0 * x[:, 0] - 2.0 * x[:, 1]

    out = morris_screening(f, bounds, n_traj=8, key=1)
    np.testing.assert_allclose(
        np.asarray(out["mu"]), [3.0, -2.0, 0.0], atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out["mu_star"]), [3.0, 2.0, 0.0], atol=1e-10
    )
    np.testing.assert_allclose(np.asarray(out["sigma"]), 0.0, atol=1e-9)


@pytest.mark.slow
def test_ishigami_screening_ranks_inputs():
    bounds = np.array([[-np.pi, np.pi]] * 3)

    def ishigami(x):
        return (jnp.sin(x[:, 0]) + 7.0 * jnp.sin(x[:, 1]) ** 2
                + 0.1 * x[:, 2] ** 4 * jnp.sin(x[:, 0]))

    out = morris_screening(ishigami, bounds, n_traj=256, key=2, n_levels=8)
    mu_star = np.asarray(out["mu_star"])
    sigma = np.asarray(out["sigma"])
    mu = np.asarray(out["mu"])
    # all three inputs matter (x3 only through interaction, but EE sees it)
    assert mu_star.min() > 0.1
    # x3 acts ONLY through the interaction term -> its signed effects
    # cancel (mu ~ 0 while mu_star is large) and sigma is comparable to
    # mu_star: the classic pure-interaction signature
    assert sigma[2] / mu_star[2] > 0.8
    assert abs(mu[2]) < 0.3 * mu_star[2]
    # x2's 7 sin^2 term is additive and interaction-free: by symmetry its
    # signed effects also cancel, but its sigma/mu_star stays moderate
    # relative to the interacting x1 (cos(x1) * (1 + 0.1 x3^4))
    assert sigma[0] > mu_star[0] * 0.5


def test_validation():
    with pytest.raises(ValueError, match="n_levels"):
        morris_trajectories(np.array([[0.0, 1.0]]), 4, n_levels=3)


def test_n_traj_validation():
    with pytest.raises(ValueError, match="n_traj"):
        morris_screening(lambda x: x[:, 0], np.array([[0.0, 1.0]]), n_traj=1)
