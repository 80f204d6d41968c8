"""API drift guards: the pyo3-parity surface must keep its exact
positional signatures (lib_math_utils_py.rs:17-283)."""
import inspect

import corrla_rs_tpu as crt


def _positional_params(fn, n):
    params = list(inspect.signature(fn).parameters.values())
    return [p.name for p in params[:n]]


def test_rsvd_signature():
    assert _positional_params(crt.rsvd, 4) == [
        "a_mat", "n_rank", "n_iters", "n_oversamples"
    ]


def test_rpca_signature():
    assert _positional_params(crt.rpca, 4) == [
        "a_mat", "n_rank", "n_iters", "n_oversamples"
    ]


def test_active_ss_signature():
    assert _positional_params(crt.active_ss, 5) == [
        "x", "y", "order", "n_nbr", "n_comps"
    ]


def test_cs_dirichlet_signature():
    assert _positional_params(crt.cs_dirichlet_sample, 6) == [
        "bounds", "n_samples", "max_zshots", "chunk_size", "c_scale",
        "alphas",
    ]


def test_cs_mcmc_signature():
    assert _positional_params(crt.cs_mcmc_dirichlet_sample, 9) == [
        "bounds", "n_samples", "n_seed_samples", "max_zshots", "chunk_size",
        "c_scale", "alphas", "gamma", "var_epsilon",
    ]


def test_class_constructor_signatures():
    assert _positional_params(crt.PyRbfInterp.__init__, 5) == [
        "self", "kernel_type", "kernel_param", "dim", "poly_degree"
    ]
    assert _positional_params(crt.PyPodI.__init__, 4) == [
        "self", "x_data", "t", "n_modes"
    ]
    assert _positional_params(crt.PyDMDc.__init__, 5) == [
        "self", "x_data", "u_data", "n_modes", "n_iters"
    ]
    # Binding parity: PyDMDc.predict is the multi-step rollout
    # (lib_math_utils_py.rs:273-282), unlike DMDc.predict (single step,
    # dmd_rom.rs:185-194).
    assert _positional_params(crt.PyDMDc.predict, 3) == [
        "self", "x_0", "u_seq"
    ]
    assert _positional_params(crt.DMDc.predict, 3) == [
        "self", "x_0", "u_input"
    ]


def test_shim_module():
    import corrla_rs

    for name in ("rsvd", "rpca", "active_ss", "cs_dirichlet_sample",
                 "cs_mcmc_dirichlet_sample", "PyRbfInterp", "PyPodI",
                 "PyDMDc"):
        assert hasattr(corrla_rs, name)
