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

# Persistent XLA compilation cache for the suite (KMSR_TEST_CACHE=0 to
# disable). The suite's cost on this 1-core host is almost entirely jit
# compiles of trainer/shard_map steps (measured: ~25 of the ~30 suite
# minutes); with the cache warm, repeat runs load AOT results in ~1s
# each. XLA:CPU logs an E-level machine-feature note on AOT load
# (compile-time adds +prefer-no-scatter/+prefer-no-gather tuning prefs
# absent from the host feature string — same machine, no real ISA
# mismatch), silenced via TF_CPP_MIN_LOG_LEVEL.
if os.environ.get("KMSR_TEST_CACHE", "1") != "0":
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

if os.environ.get("KMSR_TEST_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "KMSR_TEST_CACHE_DIR",
        os.path.expanduser("~/.cache/kmsr_tpu_test_xla"),
    )
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        if os.access(_cache_dir, os.W_OK):
            jax.config.update("jax_compilation_cache_dir", _cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except OSError:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """`exhaustive` tests are deeper spellings of invariants the default
    suite already covers once (extra mesh shapes, duplicate equivalence
    routes). They cost minutes each on this 1-core host, so they run
    only when explicitly requested: KMSR_EXHAUSTIVE=1 pytest tests/."""
    if os.environ.get("KMSR_EXHAUSTIVE"):
        return
    skip = pytest.mark.skip(reason="exhaustive tier (set KMSR_EXHAUSTIVE=1)")
    for item in items:
        if "exhaustive" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def scene(rng):
    """A small synthetic 5-band ocean-color-like scene with NaN holes."""
    data = rng.normal(5.0, 1.0, size=(5, 96, 96)).astype(np.float32)
    data[:, :8, :8] = np.nan
    return data
