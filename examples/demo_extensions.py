"""Beyond-parity extensions demo: GP regression, Gaussian copula, MCMC
convergence diagnostics (reference roadmap items readme.md:34,49-54 that
were never implemented there, plus production MCMC checks)."""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np
import jax.numpy as jnp

from corrla_rs_tpu import (
    DreamSampler,
    GaussianCopula,
    GpRegressor,
    effective_sample_size,
    gelman_rubin,
)


def main():
    rng = np.random.default_rng(0)

    # GP regression with hyperparameter MLE
    x = np.sort(rng.uniform(0, 6, 80)).astype(np.float32)[:, None]
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(80).astype(np.float32)
    gp = GpRegressor("matern52").fit(x, y)
    xq = np.linspace(0.2, 5.8, 25, dtype=np.float32)[:, None]
    mean, var = gp.predict(xq)
    err = float(np.max(np.abs(np.asarray(mean) - np.sin(xq[:, 0]))))
    print(f"GP(matern52): max err {err:.4f}; fitted noise_var "
          f"{gp.noise_var:.2e}, length_scale {gp.length_scale:.2f}")

    # Gaussian copula: lognormal x gaussian marginals with latent rho=0.8
    z = rng.multivariate_normal([0, 0], [[1, 0.8], [0.8, 1]], size=4000)
    data = np.stack([np.exp(z[:, 0]), 2 * z[:, 1] + 5], axis=1)
    cop = GaussianCopula().fit(jnp.asarray(data.astype(np.float32)))
    synth = np.asarray(cop.sample(4000, key=1))
    print(f"copula: latent corr {float(cop.corr[0,1]):.3f};"
          f" synthetic marginal medians {np.median(synth, axis=0).round(3)}"
          f" vs data {np.median(data, axis=0).round(3)}")

    # C-vine copula (the reference's 'vine copulas' roadmap item)
    from corrla_rs_tpu import CVineCopula
    from corrla_rs_tpu.ops.vine import kendall_tau

    zc = rng.multivariate_normal(
        [0, 0, 0],
        [[1.0, 0.7, 0.2], [0.7, 1.0, 0.4], [0.2, 0.4, 1.0]], size=1200)
    zc[:, 2] = np.exp(zc[:, 2])  # one heavy marginal
    vine = CVineCopula().fit(zc)
    vs = np.asarray(vine.sample(3000, key=4))
    print("vine: pair families "
          f"{[p[0] for row in vine.pairs for p in row]}; "
          f"tau01 data {float(kendall_tau(zc[:, 0], zc[:, 1])):.3f} "
          f"vine {float(kendall_tau(vs[:, 0], vs[:, 1])):.3f}")

    # Bivariate copula with AIC family selection (readme.md:49-53 TODO)
    from corrla_rs_tpu.ops.copula import BivariateCopula

    biv = BivariateCopula("auto").fit(jnp.asarray(data.astype(np.float32)))
    bs = np.asarray(biv.sample(3000, key=6))
    print(f"bivariate copula: family {biv.fitted_family} tau {biv.tau:.3f};"
          f" sample tau "
          f"{float(kendall_tau(bs[:, 0], bs[:, 1])):.3f}")

    # Sobol' indices: global variance-based sensitivity (extension)
    from corrla_rs_tpu.ops.sobol import sobol_indices

    def ishigami(xq):
        return (jnp.sin(xq[:, 0]) + 7.0 * jnp.sin(xq[:, 1]) ** 2
                + 0.1 * xq[:, 2] ** 4 * jnp.sin(xq[:, 0]))

    sob = sobol_indices(
        ishigami, np.array([[-np.pi, np.pi]] * 3), 16384, key=7,
        plan="sobol", n_boot=64,
    )
    print(f"Sobol (Ishigami): S1 {np.asarray(sob['s1']).round(3)}"
          f" (exact [0.314 0.442 0.   ]);"
          f" ST {np.asarray(sob['st']).round(3)}"
          f" (exact [0.558 0.442 0.244])")

    # Batched on-device spectra: vmapped Francis-QR eig over a family of
    # perturbed DMD-style operators (no host LAPACK anywhere)
    import jax
    from corrla_rs_tpu.ops.eig_device import eigvals_device

    base = np.diag(np.linspace(0.5, 0.99, 12)).astype(np.float32)
    fam = jnp.asarray(
        base[None] + 0.05 * rng.standard_normal((64, 12, 12)).astype(
            np.float32)
    )
    blr, bli = jax.jit(jax.vmap(eigvals_device))(fam)
    rho = np.sqrt(np.asarray(blr) ** 2 + np.asarray(bli) ** 2).max(axis=1)
    print(f"batched eig (64 operators, one vmapped call): spectral radius "
          f"p5/p50/p95 = {np.percentile(rho, [5, 50, 95]).round(3)}")

    # Ensemble DMDc: 16 complete fits (RSVDs + Francis-QR eig + modes) in
    # one vmapped dispatch — bootstrap-style spectral UQ
    from corrla_rs_tpu import dmdc_fit_ensemble, rollout_ensemble
    from corrla_rs_tpu.ops.mat_utils import mat_linspace

    xg = mat_linspace(0.0, 10.0, 20)[:, 0].astype(np.float32)
    tg = mat_linspace(0.0, 10.0, 40)[:, 0].astype(np.float32)
    uc = jnp.exp(0.2 * tg)[None, :]
    snap = jnp.sin(xg[:, None] + 0.2 * tg[None, :]) * uc
    ens = snap[None] + 2e-3 * jnp.asarray(
        rng.standard_normal((16,) + snap.shape).astype(np.float32))
    fit = dmdc_fit_ensemble(
        ens, jnp.broadcast_to(uc, (16,) + uc.shape), n_modes=6,
        n_iters=40, key=11,
    )
    lam = np.asarray(fit["lambdas_re"]) + 1j * np.asarray(fit["lambdas_im"])
    rho = np.abs(lam).max(axis=1)
    pred = rollout_ensemble(fit, ens[:, :, 0:1], uc, method="reduced")
    errs = np.abs(np.asarray(pred[:, :, 19]) - np.asarray(ens[:, :, 20]))
    print(f"ensemble DMDc (16 members, one dispatch): dominant |lambda| "
          f"{rho.min():.4f}..{rho.max():.4f}; worst rollout err "
          f"{errs.max():.1e}")

    # R-vine with learned structure + rotated families (round 3): a
    # Markov chain in the first three variables, a NEGATIVE-tau
    # lower-upper-tail pair in the last two — the rotated clayton family
    # the base set cannot represent
    from corrla_rs_tpu import RVineCopula
    from corrla_rs_tpu.ops import vine as _vine

    th90 = _vine._theta_from_tau("clayton90", -0.5)
    ww = rng.uniform(1e-6, 1 - 1e-6, (1500, 2))
    neg = np.asarray(_vine._HINV["clayton90"](
        jnp.asarray(ww[:, 1]), jnp.asarray(ww[:, 0]), th90))
    zr = rng.standard_normal((1500, 2))
    chain2 = 0.85 * zr[:, 0] + np.sqrt(1 - 0.7225) * zr[:, 1]
    rdata = np.stack([zr[:, 0], chain2, ww[:, 0], neg], axis=1)
    rv = RVineCopula().fit(rdata)
    print("R-vine learned structure:",
          [(a, b, fam) for (a, b, _c, fam, _t) in rv.trees[0]])

    # Out-of-core streamed PCA: the matrix never exists in memory (a
    # generator source), 3 total passes
    from corrla_rs_tpu import RowBlockSource, streamed_pca

    basis = rng.standard_normal((6, 64)).astype(np.float32)

    def make_rows(lo, hi):
        local = np.random.default_rng(1234 + lo)
        coef = local.standard_normal((hi - lo, 6)).astype(np.float32)
        return coef @ (basis * np.array(
            [5, 4, 3, 2, 1, 0.5], np.float32)[:, None])

    src = RowBlockSource(make_rows, (200_000, 64), np.float32)
    s_pca, comps = streamed_pca(src, 4, block_rows=16_384)
    print(f"streamed PCA over a generated 200k x 64 source: "
          f"sigma {np.asarray(s_pca[:, 0]).round(1)}")

    # DREAM + diagnostics
    def lnp(q):
        return -0.5 * jnp.sum(q**2)

    s = DreamSampler(lnp, jnp.asarray(
        rng.standard_normal((16, 4)).astype(np.float32)), n_adapt=300, key=2)
    s.sample_mcmc(2000)
    hist = s.chain_history[800:]
    print(f"DREAM: acceptance {s.accept_ratio():.3f};"
          f" R-hat {np.asarray(gelman_rubin(hist)).round(3)};"
          f" ESS {np.asarray(effective_sample_size(hist)).astype(int)}")


if __name__ == "__main__":
    main()
