"""Spatially-sharded scene degrade: parity with the single-device path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.ops import degrade
from kmsr_tpu.parallel import make_mesh
from kmsr_tpu.parallel.spatial import degrade_scene_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_names=("data",))


def test_sharded_scene_matches_single_device(mesh, rng):
    scene = jnp.asarray(rng.normal(5, 2, size=(5, 512, 128)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=8))
    got = np.asarray(degrade_scene_sharded(scene, kernel, mesh, factor=8))
    assert got.shape == (5, 64, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_scene_2d_kernel(mesh, rng):
    scene = jnp.asarray(rng.normal(size=(5, 256, 64)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(13, 13)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=4))
    got = np.asarray(degrade_scene_sharded(scene, kernel, mesh, factor=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_scene_shape_gate(mesh):
    scene = jnp.zeros((5, 100, 64))
    with pytest.raises(ValueError):
        degrade_scene_sharded(scene, jnp.ones((13, 13)), mesh, factor=8)
