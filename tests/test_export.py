"""Compiled-artifact export/serving (utils/export) — extension tests."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.utils.export import (
    export_fn,
    export_model_call,
    load_exported,
)


def test_export_roundtrip_function(rng, tmp_path):
    from corrla_rs_tpu.ops.random_svd import random_svd

    a = jnp.asarray(rng.standard_normal((64, 16)))
    path = str(tmp_path / "rsvd.stablehlo")

    def fn(a):
        return random_svd(a, 4, 6, 4, key=1)

    u0, s0, vt0 = fn(a)
    export_fn(fn, (a,), path)
    call = load_exported(path)
    u1, s1, vt1 = call(a)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=1e-12)


def test_export_model_transform_self_contained(rng, tmp_path):
    from corrla_rs_tpu.models.pca import PcaRsvd

    x = jnp.asarray(rng.standard_normal((200, 12)))
    pca = PcaRsvd(x, 4)
    path = str(tmp_path / "pca_tr.stablehlo")
    xq = jnp.asarray(rng.standard_normal((7, 12)))
    ref = np.asarray(pca.apply_tr(xq))
    export_model_call(pca, "apply_tr", (xq,), path)

    # serving side: a fresh process with ONLY jax + the artifact (the
    # library is importable there, but the script never touches it)
    script = (
        "import sys\n"
        "import numpy as np\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        f"exp = jax.export.deserialize(open({path!r}, 'rb').read())\n"
        "xq = jnp.asarray(np.load(sys.argv[1]))\n"
        "out = exp.call(xq)\n"
        "np.save(sys.argv[2], np.asarray(out))\n"
        "print('SERVE_OK')\n"
    )
    xq_file = str(tmp_path / "xq.npy")
    out_file = str(tmp_path / "out.npy")
    np.save(xq_file, np.asarray(xq))
    res = subprocess.run(
        [sys.executable, "-c", script, xq_file, out_file],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "SERVE_OK" in res.stdout
    np.testing.assert_allclose(np.load(out_file), ref, rtol=1e-12)


def test_export_dmdc_rollout(rng, tmp_path):
    from corrla_rs_tpu.models.dmd import DMDc
    from corrla_rs_tpu.ops.mat_utils import mat_linspace

    x = mat_linspace(0.0, 10.0, 20)[:, 0]
    t = mat_linspace(0.0, 10.0, 40)[:, 0]
    u = jnp.exp(0.2 * t)[None, :]
    p = jnp.sin(x[:, None] + 0.2 * t[None, :]) * u
    model = DMDc(p, u, n_modes=6, n_iters=40, eig_backend="device")
    path = str(tmp_path / "dmdc_roll.stablehlo")
    x0 = p[:, 0:1]
    ref = np.asarray(model.predict_multiple(x0, u, method="reduced"))

    def roll(x0, u_seq):
        return model.predict_multiple(x0, u_seq, method="reduced")

    export_fn(roll, (x0, u), path)
    call = load_exported(path)
    np.testing.assert_allclose(np.asarray(call(x0, u)), ref, rtol=1e-10)
