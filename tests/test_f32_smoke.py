"""f32 end-to-end smoke lane.

The main suite runs f64 (x64) to match the reference's tolerances — but
every f32-only regression of round 1 (power-iteration collapse, saddle
pinv blow-up, CholeskyQR NaNs) was invisible in f64 and only surfaced on
TPU. This lane reruns the critical flows in f32 in a subprocess (x64 is a
process-wide switch), so CPU CI catches that class.
"""
import json
import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import json
import numpy as np
import jax.numpy as jnp
from corrla_rs_tpu.ops.random_svd import random_svd
from corrla_rs_tpu import PodI, DMDc, RbfInterp
from corrla_rs_tpu.ops.samplers import constr_dirichlet_sample

out = {}

# decaying-spectrum POD family (the f32 collapse fixture)
nx, ns, sigma = 1000, 20, 2.0
x = np.linspace(0, 10, nx); t = np.linspace(1, 9, ns)[:, None]
p = ((0.5 * t) * np.exp(-((x[None, :] - t) ** 2) / sigma**2)).astype(np.float32)
u, s, vt = random_svd(jnp.asarray(p), 4, 10, 10, key=0)
s_exact = np.linalg.svd(p.astype(np.float64), compute_uv=False)[:4]
out["pod_sigma_rel"] = float(np.max(np.abs(np.asarray(s, np.float64) - s_exact) / s_exact))

pod = PodI(jnp.asarray(p), jnp.asarray(t.astype(np.float32)), 4)
pred = pod.predict(jnp.asarray([[5.2]], dtype=jnp.float32))
truth = (0.5 * 5.2) * np.exp(-((x - 5.2) ** 2) / sigma**2)
out["pod_field_rel"] = float(
    np.linalg.norm(np.asarray(pred)[:, 0] - truth) / np.linalg.norm(truth)
)

# DMDc sine fixture
xp = np.linspace(0, 10, 200); tp = np.linspace(0, 10, 40)
useq = np.exp(0.2 * tp)[None, :].astype(np.float32)
snaps = (np.sin(xp[:, None] + 0.2 * tp[None, :]) * useq).astype(np.float32)
m = DMDc(jnp.asarray(snaps), jnp.asarray(useq), 12, 20)
pm = m.predict_multiple(jnp.asarray(snaps[:, :1]), jnp.asarray(useq))
out["dmd_err"] = float(np.abs(np.asarray(pm)[:, 19] - snaps[:, 20]).max())

# RBF saddle solve
xi = np.random.default_rng(0).standard_normal((40, 2)).astype(np.float32)
yi = (np.sin(xi[:, :1]) + np.sin(xi[:, 1:2])).astype(np.float32)
rbf = RbfInterp(2, 1.0, 2, 1).fit(xi, yi)
out["rbf_support_err"] = float(np.abs(np.asarray(rbf.predict(xi)) - yi).max())

# rejection sampler in f32
bounds = np.array([[0.0, 0.0026], [0.1955, 0.1995], [0.80, 0.825]],
                  dtype=np.float32)
smp = constr_dirichlet_sample(bounds, 16, 500, 50000, 1.0, key=0)
out["sampler_sum_err"] = float(np.abs(np.asarray(smp).sum(1) - 1.0).max())

print(json.dumps(out))
"""


def test_f32_end_to_end():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["pod_sigma_rel"] < 1e-4, out
    assert out["pod_field_rel"] < 0.1, out
    assert out["dmd_err"] < 5e-2, out
    assert out["rbf_support_err"] < 1e-2, out
    assert out["sampler_sum_err"] < 1e-5, out
