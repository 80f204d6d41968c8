"""DMDc benchmark — parity workload with reference examples/benchmark_dmd.py.

Reference config (benchmark_dmd.py:16-18,116-126): 5,000 x 40 snapshots,
1 control input, 12 modes, 20 RSVD iterations; fit + predict wall-clock,
compared against PyDMD's DMDc when available.
"""
try:
    from corrla_rs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
except Exception:
    pass

import numpy as np

from corrla_rs_tpu import DMDc
from corrla_rs_tpu.utils.tracing import timed


def main():
    nx, nt = 5_000, 40
    x = np.linspace(0.0, 10.0, nx)
    t = np.linspace(0.0, 10.0, nt)
    u_seq = np.exp(0.2 * t)[None, :]
    snaps = np.sin(x[:, None] + 0.2 * t[None, :]) * u_seq
    snaps = snaps.astype(np.float32)
    u_seq32 = u_seq.astype(np.float32)

    wall_fit, model = timed(lambda: DMDc(snaps, u_seq32, 12, 20), n_runs=1)
    print(f"DMDc fit ({nx} x {nt}, 12 modes, 20 iters): {wall_fit:.4f} s")

    x0 = snaps[:, 0:1]
    wall_pred, pred = timed(lambda: model.predict_multiple(x0, u_seq32))
    err = float(np.abs(np.asarray(pred)[:, 19] - snaps[:, 20]).max())
    print(f"DMDc predict: {wall_pred:.4f} s; max abs err @ step 20: {err:.4f}")

    try:
        import time

        from pydmd import DMDc as PyDMDc

        t0 = time.perf_counter()
        ref = PyDMDc(svd_rank=12)
        ref.fit(np.asarray(snaps, np.float64), np.asarray(u_seq, np.float64))
        print(f"PyDMD DMDc fit: {time.perf_counter()-t0:.4f} s")
    except ImportError:
        print("pydmd not available; skipping comparison")


if __name__ == "__main__":
    main()
