"""Utility-module tests (tracing, cache, prng, config, log)."""
import jax
import jax.numpy as jnp
import numpy as np

from corrla_rs_tpu.utils.config import (
    DmdConfig,
    DreamConfig,
    PcaConfig,
    RsvdConfig,
)
from corrla_rs_tpu.utils.log import get_logger
from corrla_rs_tpu.utils.prng import as_key, split_key
from corrla_rs_tpu.utils.tracing import device_sync, timed


def test_as_key_forms():
    k1 = as_key(7)
    k2 = as_key(jax.random.key(7))
    assert jax.dtypes.issubdtype(k1.dtype, jax.dtypes.prng_key)
    np.testing.assert_array_equal(
        jax.random.key_data(k1), jax.random.key_data(k2)
    )
    k3 = as_key(None)
    assert jax.dtypes.issubdtype(k3.dtype, jax.dtypes.prng_key)
    # traced integer seed
    out = jax.jit(lambda s: jax.random.uniform(as_key(s)))(3)
    assert 0.0 <= float(out) <= 1.0


def test_split_key():
    ks = split_key(0, 4)
    assert ks.shape[0] == 4


def test_timed_and_sync(rng):
    a = jnp.asarray(rng.standard_normal((64, 64)))
    wall, out = timed(lambda: a @ a, n_runs=2)
    assert wall >= 0.0
    assert out.shape == (64, 64)
    assert isinstance(device_sync(out), float)
    # host numpy arrays and empties are skipped, not crashed on
    assert device_sync([np.ones(3), jnp.zeros((0,)), None]) == 0.0


def test_configs_frozen_defaults():
    assert PcaConfig().n_iter == 20          # pca_rsvd.rs:66
    assert DmdConfig().n_oversamples == 12   # dmd_rom.rs:72
    assert RsvdConfig().n_oversamples == 10
    assert DreamConfig().delta_max == 3
    import dataclasses
    import pytest

    with pytest.raises(dataclasses.FrozenInstanceError):
        PcaConfig().n_iter = 5


def test_logger():
    lg = get_logger()
    assert lg.name == "corrla_rs_tpu"
    lg.info("no-op with NullHandler")
