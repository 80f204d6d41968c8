"""POD benchmark — parity workload with reference examples/benchmark_pod.py.

Reference config (benchmark_pod.py:135-212): 20 snapshots x 5,000 points,
4 modes; fit + predict wall-clock.
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np

from corrla_rs_tpu import PodI
from corrla_rs_tpu.utils.tracing import timed


def main():
    # NOTE: the reference fixture uses sigma=0.25 (pod_rom.rs:130), but its
    # pulses are then nearly orthogonal (spacing 0.42 >> width) and the
    # snapshot family is full-rank: the *exact* rank-4 truncation error of
    # snapshot 10 is 0.9995, so any POD looks "wrong". sigma=2.0 gives a
    # genuinely low-rank family (exact rank-4 error 0.048) and demonstrates
    # actual ROM quality.
    nx, n_snap, sigma = 5_000, 20, 2.0
    x = np.linspace(0.0, 10.0, nx)
    t = np.linspace(1.0, 9.0, n_snap)[:, None]
    p = (0.5 * t) * np.exp(-((x[None, :] - t) ** 2) / sigma**2)
    p = p.astype(np.float32)
    t = t.astype(np.float32)

    wall_fit, pod = timed(lambda: PodI(p, t, 4))
    print(f"POD fit (20 x {nx}, 4 modes): {wall_fit:.4f} s")

    tq = np.array([[5.2]], dtype=np.float32)
    wall_pred, pred = timed(lambda: pod.predict(tq))
    truth = (0.5 * 5.2) * np.exp(-((x - 5.2) ** 2) / sigma**2)
    rel = float(
        np.linalg.norm(np.asarray(pred)[:, 0] - truth) / np.linalg.norm(truth)
    )
    print(f"POD predict: {wall_pred:.4f} s; rel field err @ t=5.2: {rel:.3f}")


if __name__ == "__main__":
    main()
