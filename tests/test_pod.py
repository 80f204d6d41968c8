"""POD parity tests (fixture from reference pod_rom.rs:122-156)."""
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.models.pod import PodI
from corrla_rs_tpu.ops.mat_utils import mat_linspace
from corrla_rs_tpu.utils.testing import assert_mat_approx_eq


def _pulse_snapshots(nx=100, n_snapshots=20, sigma=0.25):
    # Gaussian pressure pulse fixture, parity with pod_rom.rs:128-147
    # (including the reference's quirky mat_linspace).
    x = mat_linspace(0.0, 10.0, nx)[:, 0]
    t = mat_linspace(1.0, 9.0, n_snapshots)
    p = (0.5 * t) * jnp.exp(-((x[None, :] - t) ** 2) / sigma**2)
    return p, t, x  # p rows = snapshots


def test_pod_full_rank_exact_at_support():
    # With n_modes = n_snapshots the ROM reproduces a support snapshot
    # exactly; t = 5.2 is the 13th abscissa (13 * 0.4).
    p, t, _x = _pulse_snapshots()
    pod = PodI(p, t, 20)
    pred = pod.predict(jnp.array([[5.2]]))
    assert pred.shape == (100, 1)
    assert_mat_approx_eq(pred[:, 0], p[13, :], 1e-6)


def test_pod_truncated_predict():
    # 4 modes (reference test config, pod_rom.rs:149): truncation error is
    # the only error at a support abscissa.
    p, t, _x = _pulse_snapshots()
    pod = PodI(p, t, 4)
    pred = pod.predict(jnp.array([[5.2]]))
    truth = p[13, :]
    rel = float(
        jnp.linalg.norm(pred[:, 0] - truth) / jnp.linalg.norm(truth)
    )
    # A translating pulse has a slowly decaying spectrum; 4 modes give only
    # coarse accuracy (the reference test prints without asserting,
    # pod_rom.rs:150-154). Sanity-bound the relative error only.
    assert rel < 1.0
    # and the 4-mode reconstruction of the training snapshot itself matches
    # the prediction at the support point (interpolation is exact there)
    recon = pod.modes @ pod.mode_weights[13][:, None]
    assert_mat_approx_eq(pred, recon, 1e-6)


def test_pod_mode_shapes():
    p, t, _x = _pulse_snapshots()
    pod = PodI(p, t, 4)
    assert pod.modes.shape == (100, 4)
    assert pod.mode_weights.shape == (20, 4)
    assert pod.n_snapshots == 20


def test_pod_weights_reconstruct_snapshots():
    # Full-rank weights @ modes^T == snapshots.
    p, t, _x = _pulse_snapshots()
    pod = PodI(p, t, 20)
    recon = pod.mode_weights @ pod.modes.T
    assert_mat_approx_eq(recon, p, 1e-7)
