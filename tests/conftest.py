"""Test configuration: force an 8-device virtual CPU platform so sharding /
pjit tests exercise real multi-device paths without TPU hardware.

Note: in this image the axon TPU plugin overrides JAX_PLATFORMS, so we pin
the platform via JAX_PLATFORM_NAME *and* jax.config before any test runs.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def scene(rng):
    """A small synthetic 5-band ocean-color-like scene with NaN holes."""
    data = rng.normal(5.0, 1.0, size=(5, 96, 96)).astype(np.float32)
    data[:, :8, :8] = np.nan
    return data
