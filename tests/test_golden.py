"""Golden-value regression tests (SURVEY.md §4 rebuild test plan item (a)).

Fixed-seed f64 outputs recorded at build time in tests/golden_values.npz.
Any drift in the numerics (algorithm edits, jax PRNG/impl changes) shows up
as a diff against these goldens. Regenerate deliberately with:

    python tests/test_golden.py --regen
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_values.npz")


def _compute_goldens():
    import corrla_rs_tpu as crt
    from corrla_rs_tpu.ops.interp import rbf_fit, rbf_predict
    from corrla_rs_tpu.ops.samplers import (
        DeMcSampler,
        ln_like_sum,
        ln_prior_uniform,
    )
    from corrla_rs_tpu.ops.stats_corr import linear_fit, pearson_corr

    rng = np.random.default_rng(12345)
    out = {}

    a = jnp.asarray(rng.standard_normal((80, 24)))
    u, s, vt = crt.rsvd(a, 6, 10, 8, seed=11)
    out["rsvd_s"] = np.asarray(s[:, 0])
    out["rsvd_u_col0_abs"] = np.abs(np.asarray(u[:, 0]))

    x = jnp.asarray(rng.standard_normal((200, 5)))
    out["pearson"] = np.asarray(pearson_corr(x))

    y = (2.0 * x[:, 0] - x[:, 2] + 0.5)[:, None]
    out["linfit"] = np.asarray(linear_fit(x, y))

    xi = jnp.asarray(rng.standard_normal((30, 2)))
    yi = jnp.sin(xi[:, :1])
    coeffs = rbf_fit(xi, yi, "multiquadric", 1.0, 1)
    out["rbf_coeffs"] = np.asarray(coeffs)
    out["rbf_pred"] = np.asarray(
        rbf_predict(xi, coeffs, xi[:7], "multiquadric", 1.0, 1)
    )

    def lnp_like(q):
        return -0.5 * jnp.sum(q**2)

    lnp = ln_like_sum(lnp_like, ln_prior_uniform(np.array([[-9.0, 9.0]] * 2)))
    smp = DeMcSampler(lnp, jnp.zeros((4, 2)) + 0.1, 0.8, 1e-10, key=5)
    smp.sample_mcmc(50)
    out["demc_tail"] = np.asarray(smp.get_samples(10))
    return out


def test_golden_values():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("golden file missing; run: python tests/test_golden.py --regen")
    golden = np.load(GOLDEN_PATH)
    current = _compute_goldens()
    assert set(golden.files) == set(current)
    for k in golden.files:
        np.testing.assert_allclose(
            current[k], golden[k], rtol=1e-9, atol=1e-12,
            err_msg=f"golden drift in {k}",
        )


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        np.savez(GOLDEN_PATH, **_compute_goldens())
        print(f"wrote {GOLDEN_PATH}")
