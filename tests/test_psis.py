"""PSIS: k-hat diagnostic calibration + reweighting oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from corrla_rs_tpu.ops.psis import importance_resample, psis


def _gaussian_is_logw(rng, n, proposal_sd, target_sd=1.0):
    """Draws from N(0, proposal_sd^2), target N(0, target_sd^2):
    known tail index k = 1 - (proposal/target... analytic: the weight
    w = N_t(x)/N_p(x) has finite variance iff proposal_sd^2 >
    target_sd^2 / 2... k_hat tracks tail heaviness monotonically."""
    x = rng.normal(0.0, proposal_sd, n)
    lw = (-0.5 * x ** 2 / target_sd ** 2 + 0.5 * x ** 2 / proposal_sd ** 2
          - np.log(target_sd) + np.log(proposal_sd))
    return x, lw


def test_k_hat_orders_tail_risk():
    """Wider proposal than target (light-tailed weights) -> low k_hat;
    narrower proposal (heavy-tailed weights) -> high k_hat."""
    # theoretical tail index xi = 2 c p^2 with c = 1/(2 p^2) - 1/2:
    # proposal_sd = 2.0 -> xi < 0 (bounded weights);
    # proposal_sd = 0.4 -> xi = 0.84 (clearly past the 0.7 threshold)
    rng = np.random.default_rng(0)
    _x, lw_safe = _gaussian_is_logw(rng, 4000, proposal_sd=2.0)
    _x, lw_risky = _gaussian_is_logw(rng, 12000, proposal_sd=0.35)
    safe = psis(lw_safe)
    risky = psis(lw_risky)
    assert safe.k_hat < 0.5
    assert risky.k_hat > 0.7
    assert safe.k_hat < risky.k_hat
    assert safe.ess > risky.ess


def test_reweighted_mean_and_smoothing_improves():
    """Estimate a shifted-target mean through IS: the PSIS-smoothed
    estimate matches the truth; raw-weight estimate is noisier over
    replications."""
    rng = np.random.default_rng(1)
    mu_t = 1.0
    errs_sm = []
    for rep in range(20):
        x = rng.normal(0.0, 1.3, 3000)             # proposal N(0, 1.3^2)
        lw = (-0.5 * (x - mu_t) ** 2) - (-0.5 * x ** 2 / 1.3 ** 2
                                         - np.log(1.3))
        res = psis(lw)
        w = np.exp(np.asarray(res.log_weights))
        errs_sm.append(abs(float(np.dot(w, x)) - mu_t))
    assert np.mean(errs_sm) < 0.06
    assert res.k_hat < 0.7


@pytest.mark.slow
def test_importance_resample():
    rng = np.random.default_rng(2)
    x = rng.normal(0.0, 2.0, (8000, 1))            # wide proposal
    lw = -0.5 * ((x[:, 0] - 0.5) / 0.8) ** 2 - (-0.5 * (x[:, 0] / 2) ** 2)
    draws, res = importance_resample(jnp.asarray(x), lw, 4000, key=3)
    assert res.k_hat < 0.7
    d = np.asarray(draws[:, 0])
    assert d.mean() == pytest.approx(0.5, abs=0.08)
    assert d.std() == pytest.approx(0.8, abs=0.08)


def test_weights_normalized_and_validation():
    rng = np.random.default_rng(4)
    res = psis(rng.standard_normal(100))
    total = float(jnp.sum(jnp.exp(res.log_weights)))
    assert total == pytest.approx(1.0, rel=1e-12)
    assert res.n_tail > 0
    with pytest.raises(ValueError, match=">= 5"):
        psis(np.zeros(3))


def test_tiny_sample_fails_safe():
    """Regression (review): too few weights to fit the GPD must read as
    UNRELIABLE (k_hat = +inf), never as sound."""
    res = psis(np.random.default_rng(5).standard_normal(12))
    assert res.k_hat == float("inf")
    assert res.n_tail == 0
    assert not (res.k_hat < 0.7)
