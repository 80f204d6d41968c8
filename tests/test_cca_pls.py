"""CCA (ops/cca) and SIMPLS PLS regression (ops/pls).

EXTENSION tests — the reference's correlation layer (stats_corr.rs)
covers one variable block and Vandermonde OLS; these pin the two-block
completions against closed-form oracles and sklearn.
"""
import numpy as np
import pytest

from corrla_rs_tpu import Cca, PlsRegressor, cca, pls_fit
from corrla_rs_tpu.utils.checkpoint import load_model, save_model


def _np_cca_corrs(x, y):
    """Direct numpy oracle: singular values of Sxx^{-1/2} Sxy Syy^{-1/2}."""
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    n = x.shape[0]
    sxx = xc.T @ xc / (n - 1)
    syy = yc.T @ yc / (n - 1)
    sxy = xc.T @ yc / (n - 1)

    def inv_sqrt(s):
        w, v = np.linalg.eigh(s)
        return v @ np.diag(1.0 / np.sqrt(w)) @ v.T

    m = inv_sqrt(sxx) @ sxy @ inv_sqrt(syy)
    return np.linalg.svd(m, compute_uv=False)


def _two_block(rng, n=4000, p=5, q=4, rhos=(0.9, 0.5)):
    """Blocks sharing len(rhos) latent factors with known canonical
    correlations ``rhos`` (before mixing)."""
    k = len(rhos)
    zx = rng.standard_normal((n, k))
    zy = np.array(rhos)[None, :] * zx + np.sqrt(
        1 - np.array(rhos)[None, :] ** 2
    ) * rng.standard_normal((n, k))
    x = np.hstack([zx, rng.standard_normal((n, p - k))])
    y = np.hstack([zy, rng.standard_normal((n, q - k))])
    # invertible mixing hides the factors
    x = x @ rng.standard_normal((p, p))
    y = y @ rng.standard_normal((q, q))
    return x, y


def test_cca_matches_numpy_oracle(rng):
    x, y = _two_block(rng)
    fit = cca(x, y)
    want = _np_cca_corrs(x, y)
    np.testing.assert_allclose(fit.corrs, want, rtol=1e-8, atol=1e-10)
    # mixing-invariant latent correlations recovered
    assert abs(fit.corrs[0] - 0.9) < 0.03
    assert abs(fit.corrs[1] - 0.5) < 0.05
    # training variates realize the canonical correlations
    u, v = fit.transform(x, y)
    u, v = np.asarray(u), np.asarray(v)
    for i in range(2):
        r = np.corrcoef(u[:, i], v[:, i])[0, 1]
        assert abs(r - fit.corrs[i]) < 1e-6
    # cross-pair variates are uncorrelated
    assert abs(np.corrcoef(u[:, 0], v[:, 1])[0, 1]) < 5e-2


def test_cca_heldout_score(rng):
    x, y = _two_block(rng, n=6000)
    fit = cca(x[:3000], y[:3000], n_components=2)
    oos = fit.score(x[3000:], y[3000:])
    assert abs(oos[0] - 0.9) < 0.05
    assert abs(oos[1] - 0.5) < 0.08


def test_cca_regularization_tames_overfit(rng):
    # p + q ~ n: plain CCA saturates at corr ~1 on pure noise
    x = rng.standard_normal((60, 25))
    y = rng.standard_normal((60, 25))
    plain = cca(x, y, n_components=1)
    regd = cca(x, y, n_components=1, reg=1.0)
    assert plain.corrs[0] > 0.9  # the overfit being tamed
    assert regd.corrs[0] < 0.8


def test_cca_checkpoint_and_validation(tmp_path, rng):
    x, y = _two_block(rng, n=500)
    fit = cca(x, y, n_components=2)
    path = str(tmp_path / "cca.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, Cca)
    np.testing.assert_allclose(fit2.corrs, fit.corrs)
    u1, _ = fit.transform(x[:10])
    u2, _ = fit2.transform(x[:10])
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1))
    with pytest.raises(ValueError, match="equal rows"):
        cca(x, y[:-1])
    with pytest.raises(ValueError, match="n_components"):
        cca(x, y, n_components=99)
    with pytest.raises(ValueError, match="reg"):
        cca(x, y, reg=-1.0)


def test_pls_univariate_matches_sklearn(rng):
    from sklearn.cross_decomposition import PLSRegression

    x = rng.standard_normal((200, 12))
    beta = np.zeros(12)
    beta[:4] = [2.0, -1.0, 0.5, 1.5]
    y = x @ beta + 0.1 * rng.standard_normal(200)
    for k in (1, 3, 6):
        ours = pls_fit(x, y, k)
        skl = PLSRegression(n_components=k, scale=False).fit(x, y[:, None])
        x_new = rng.standard_normal((50, 12))
        np.testing.assert_allclose(
            np.asarray(ours.predict(x_new))[:, 0],
            skl.predict(x_new)[:, 0],
            rtol=1e-8, atol=1e-8,
        )


def test_pls_full_rank_recovers_ols(rng):
    x = rng.standard_normal((100, 6))
    y = rng.standard_normal((100, 2))
    fit = pls_fit(x, y, 6)
    xc = x - x.mean(axis=0)
    yc = y - y.mean(axis=0)
    coef_ols = np.linalg.lstsq(xc, yc, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(fit.coef), coef_ols,
                               rtol=1e-8, atol=1e-10)


def test_pls_wide_collinear_block(rng):
    # p > n with heavy collinearity: OLS is ill-posed, PLS regularizes
    n, p = 60, 150
    latent = rng.standard_normal((n, 3))
    x = latent @ rng.standard_normal((3, p)) + 0.05 * rng.standard_normal((n, p))
    y = latent @ np.array([1.0, -2.0, 0.5]) + 0.05 * rng.standard_normal(n)
    fit = pls_fit(x[:40], y[:40], 3)
    assert fit.score(x[40:], y[40:]) > 0.9


def test_pls_score_monotone_in_train(rng):
    x = rng.standard_normal((80, 10))
    y = x @ rng.standard_normal(10) + 0.5 * rng.standard_normal(80)
    r2 = [pls_fit(x, y, k).score(x, y) for k in (1, 2, 4, 8)]
    assert all(b >= a - 1e-12 for a, b in zip(r2, r2[1:]))


def test_pls_checkpoint_and_validation(tmp_path, rng):
    x = rng.standard_normal((50, 8))
    y = rng.standard_normal((50, 2))
    fit = pls_fit(x, y, 3)
    path = str(tmp_path / "pls.npz")
    save_model(path, fit)
    fit2 = load_model(path)
    assert isinstance(fit2, PlsRegressor)
    np.testing.assert_allclose(np.asarray(fit2.predict(x)),
                               np.asarray(fit.predict(x)))
    np.testing.assert_allclose(np.asarray(fit2.transform(x)),
                               np.asarray(fit.transform(x)))
    with pytest.raises(ValueError, match="equal rows"):
        pls_fit(x, y[:-1], 2)
    with pytest.raises(ValueError, match="n_components"):
        pls_fit(x, y, 0)
