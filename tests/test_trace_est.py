"""Stochastic trace estimation (Hutchinson, Hutch++).

EXTENSION tests — oracles: exact traces of synthetic PSD matrices; the
Hutch++ variance advantage over plain Hutchinson at equal budget; the
matrix-free callable path agreeing with the explicit-matrix path.
"""
import numpy as np
import pytest

from corrla_rs_tpu import hutchinson_trace, hutchpp_trace


def _psd(rng, n=300, decay=2.0):
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.arange(1, n + 1, dtype=float) ** (-decay)
    return (q * lam) @ q.T, float(np.sum(lam))


def test_hutchpp_accuracy_and_variance_advantage(rng):
    a, tr_true = _psd(rng)
    est_pp = [hutchpp_trace(a, n_probes=30, key=k) for k in range(12)]
    est_h = [hutchinson_trace(a, n_probes=30, key=k) for k in range(12)]
    err_pp = np.abs(np.asarray(est_pp) - tr_true)
    err_h = np.abs(np.asarray(est_h) - tr_true)
    # Hutch++ on a decaying PSD spectrum: large accuracy win
    assert np.mean(err_pp) < 0.2 * np.mean(err_h)
    assert np.mean(err_pp) < 0.01 * tr_true


def test_exact_on_low_rank(rng):
    # rank-5 PSD with 30 probes: the QB step captures the whole range,
    # the residual is zero -> exact trace
    g = rng.standard_normal((200, 5))
    a = g @ g.T
    est = hutchpp_trace(a, n_probes=30, key=1)
    assert est == pytest.approx(float(np.trace(a)), rel=1e-10)


def test_callable_operator_matches_matrix(rng):
    import jax.numpy as jnp

    a, _ = _psd(rng, n=150)
    aj = jnp.asarray(a)
    got_mat = hutchpp_trace(a, n_probes=24, key=3)
    got_fn = hutchpp_trace(lambda blk: aj @ blk, n_probes=24, key=3,
                           n_dim=150, dtype=aj.dtype)
    assert got_fn == pytest.approx(got_mat, rel=1e-10)


def test_validation(rng):
    a, _ = _psd(rng, n=20)
    with pytest.raises(ValueError, match="square"):
        hutchinson_trace(a[:5], 8)
    with pytest.raises(ValueError, match="n_probes"):
        hutchpp_trace(a, n_probes=2)
    with pytest.raises(ValueError, match="n_dim"):
        hutchpp_trace(lambda b: b, n_probes=9)
    with pytest.raises(TypeError, match="explicit"):
        hutchinson_trace(lambda b: b, 8)
