"""Checkpoint round-trip tests (rebuild-only capability; SURVEY.md §5)."""
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu import DMDc, PcaRsvd, PodI, RbfInterp
from corrla_rs_tpu.ops.univariate_rv import KdeRv, NormalRv
from corrla_rs_tpu.utils.checkpoint import load_model, save_model
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def test_pca_round_trip(rng, tmp_path):
    x = jnp.asarray(rng.standard_normal((200, 6)))
    pca = PcaRsvd(x, 3)
    path = str(tmp_path / "pca.npz")
    save_model(path, pca)
    pca2 = load_model(path)
    assert_mat_approx_eq(pca2.components, pca.components)
    assert_mat_approx_eq(pca2.apply_tr(x), pca.apply_tr(x))
    assert pca2.n_samples == 200


def test_pod_round_trip(rng, tmp_path):
    p = jnp.asarray(rng.standard_normal((10, 50)))
    t = jnp.linspace(0, 1, 10)[:, None]
    pod = PodI(p, t, 3)
    path = str(tmp_path / "pod.npz")
    save_model(path, pod)
    pod2 = load_model(path)
    tq = jnp.array([[0.35]])
    assert_mat_approx_eq(pod2.predict(tq), pod.predict(tq))


def test_dmdc_round_trip(rng, tmp_path):
    x = np.linspace(0, 10, 20)
    t = np.linspace(0, 10, 30)
    u = np.exp(0.2 * t)[None, :]
    snaps = jnp.asarray(np.sin(x[:, None] + 0.2 * t[None, :]) * u)
    model = DMDc(snaps, jnp.asarray(u), 8, 20)
    path = str(tmp_path / "dmd.npz")
    save_model(path, model)
    model2 = load_model(path)
    x0 = snaps[:, 0:1]
    assert_mat_approx_eq(
        model2.predict_multiple(x0, jnp.asarray(u)),
        model.predict_multiple(x0, jnp.asarray(u)),
    )
    np.testing.assert_allclose(
        np.asarray(model2.lambdas), np.asarray(model.lambdas)
    )


def test_rbf_round_trip(rng, tmp_path):
    x = jnp.asarray(rng.standard_normal((30, 2)))
    y = jnp.sin(x[:, :1])
    rbf = RbfInterp(2, 1.0, 2, 1).fit(x, y)
    path = str(tmp_path / "rbf.npz")
    save_model(path, rbf)
    rbf2 = load_model(path)
    assert rbf2.kernel == "multiquadric"
    assert_mat_approx_eq(rbf2.predict(x), rbf.predict(x))


def test_rv_round_trip(rng, tmp_path):
    kde = KdeRv(0.7, jnp.asarray(rng.standard_normal(50)))
    path = str(tmp_path / "kde.npz")
    save_model(path, kde)
    kde2 = load_model(path)
    xs = jnp.linspace(-2, 2, 7)
    assert_mat_approx_eq(kde2.pdf(xs), kde.pdf(xs))

    nrm = NormalRv(1.5, 2.5)
    save_model(str(tmp_path / "n.npz"), nrm)
    nrm2 = load_model(str(tmp_path / "n.npz"))
    assert nrm2.mu == 1.5 and nrm2.std == 2.5


def test_unserializable_raises(tmp_path):
    class Weird:
        pass

    w = Weird()
    w.f = lambda x: x
    from corrla_rs_tpu.utils.checkpoint import save_model

    with pytest.raises(TypeError):
        save_model(str(tmp_path / "w.npz"), w)


def test_mesh_fitted_model_round_trip(rng, tmp_path):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from corrla_rs_tpu.parallel.mesh import make_mesh

    x = jnp.asarray(rng.standard_normal((160, 8)))
    pca = PcaRsvd(x, 3, mesh=make_mesh(8))
    path = str(tmp_path / "pca_mesh.npz")
    save_model(path, pca)  # mesh dropped, not a crash
    pca2 = load_model(path)
    assert pca2._mesh is None
    assert_mat_approx_eq(pca2.apply_tr(x), pca.apply_tr(x), 1e-10)


def test_dream_state_roundtrip(tmp_path):
    import jax.numpy as jnp

    from corrla_rs_tpu.ops.dream import dream_run
    from corrla_rs_tpu.utils.checkpoint import (
        load_dream_state,
        save_dream_state,
    )

    def lnp(x):
        return -0.5 * jnp.sum(x**2)

    heads0 = jnp.asarray(np.random.default_rng(0).standard_normal((10, 2)))
    _h, state = dream_run(heads0, lnp, 60, key=3, n_adapt=40)
    p = str(tmp_path / "dream_state.npz")
    save_dream_state(p, state)
    state2 = load_dream_state(p)
    for f in ("heads", "head_lnp", "p_cr", "jump_dist", "n_id",
              "n_accept", "t"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state2, f)), np.asarray(getattr(state, f)), f
        )
    # resuming from the reloaded state continues the SAME trajectory as
    # resuming from the in-memory one (key round-trips exactly)
    h_a, s_a = dream_run(None, lnp, 20, key=7, n_adapt=40, init_state=state)
    h_b, s_b = dream_run(None, lnp, 20, key=7, n_adapt=40, init_state=state2)
    np.testing.assert_array_equal(np.asarray(h_a), np.asarray(h_b))
    assert int(s_b.t) == 80


def test_gp_checkpoint_roundtrip(rng, tmp_path):
    from corrla_rs_tpu.ops.gp import GpRegressor

    x = np.sort(rng.uniform(0, 6, 40))[:, None]
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(40)
    gp = GpRegressor("rbf", 1.0, 1.0, 1e-4).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    path = str(tmp_path / "gp.npz")
    save_model(path, gp)
    gp2 = load_model(path)
    xq = jnp.asarray(np.linspace(0.5, 5.5, 11)[:, None])
    m1, v1 = gp.predict(xq)
    m2, v2 = gp2.predict(xq)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-12)


@pytest.mark.slow
def test_copula_checkpoint_roundtrips(rng, tmp_path):
    from corrla_rs_tpu.ops.copula import BivariateCopula, GaussianCopula
    from corrla_rs_tpu.ops.vine import CVineCopula

    z = rng.multivariate_normal([0, 0, 0],
                                [[1, .7, .2], [.7, 1, .4], [.2, .4, 1]],
                                size=400)
    g = GaussianCopula().fit(jnp.asarray(z[:, :2]))
    b = BivariateCopula("auto").fit(jnp.asarray(z[:, :2]))
    v = CVineCopula().fit(z)
    for model, name in ((g, "g"), (b, "b"), (v, "v")):
        path = str(tmp_path / f"{name}.npz")
        save_model(path, model)
        m2 = load_model(path)
        s1 = np.asarray(model.sample(50, key=9))
        s2 = np.asarray(m2.sample(50, key=9))
        np.testing.assert_allclose(s2, s1, rtol=1e-12, err_msg=name)
    # vine nested pair table survives (tuples -> lists, same unpacking)
    v2 = load_model(str(tmp_path / "v.npz"))
    assert len(v2.pairs) == len(v.pairs)
    fam0, th0 = v2.pairs[0][0]
    assert fam0 == v.pairs[0][0][0]


def test_sparse_gp_checkpoint_roundtrip(rng, tmp_path):
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    x = np.sort(rng.uniform(0, 6, 200))[:, None]
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(200)
    sp = SparseGpRegressor("rbf", inducing=16, key=1).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    path = str(tmp_path / "sgpr.npz")
    save_model(path, sp)
    sp2 = load_model(path)
    xq = jnp.asarray(np.linspace(0.5, 5.5, 11)[:, None])
    m1, v1 = sp.predict(xq)
    m2, v2 = sp2.predict(xq)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-12)


def test_sparse_gp_legacy_checkpoint_without_y_scale(rng, tmp_path):
    # checkpoints written before y-standardization carry no _y_scale; the
    # class-level default 1.0 reproduces their unstandardized pipeline
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    x = np.sort(rng.uniform(0, 6, 100))[:, None]
    y = np.sin(x[:, 0])
    sp = SparseGpRegressor("rbf", inducing=12, key=1).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    path = str(tmp_path / "legacy.npz")
    save_model(path, sp)
    sp2 = load_model(path)
    del sp2.__dict__["_y_scale"]          # simulate a pre-change file
    xq = jnp.asarray(np.linspace(1, 5, 7)[:, None])
    m = sp2.predict(xq)[0]                # must not raise
    assert np.isfinite(np.asarray(m)).all()
    assert sp2._y_scale == 1.0            # class default


@pytest.mark.slow
def test_sparse_gp_legacy_checkpoint_refit(rng, tmp_path):
    # legacy files also lack _init_spec; the class default must let a
    # refit run (review finding: AttributeError on fit after load)
    from corrla_rs_tpu.ops.gp import SparseGpRegressor

    x = np.sort(rng.uniform(0, 6, 80))[:, None]
    y = np.sin(x[:, 0])
    sp = SparseGpRegressor("rbf", inducing=10, key=1).fit(
        jnp.asarray(x), jnp.asarray(y), optimize_hypers=False
    )
    path = str(tmp_path / "legacy2.npz")
    save_model(path, sp)
    sp2 = load_model(path)
    sp2.__dict__.pop("_init_spec", None)
    sp2.__dict__.pop("_y_scale", None)
    sp2.fit(jnp.asarray(x), jnp.asarray(y))     # must not raise
    m = sp2.predict(jnp.asarray(x[:5]))[0]
    assert np.isfinite(np.asarray(m)).all()
