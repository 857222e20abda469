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


@pytest.mark.slow
@pytest.mark.exhaustive  # production f=8/13x13 sharded geometry: ~4 min of
# 8-shard XLA compile on this host. The invariant (halo exchange + seam
# parity) runs every suite at small span in
# test_sharded_small_kernel_matches_single_device; the f=8 composition is
# also exercised by dryrun_multichip each round and by scripts/tpu_parity.py
# on hardware.
def test_sharded_scene_matches_single_device(mesh, rng):
    scene = jnp.asarray(rng.normal(5, 2, size=(5, 512, 128)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=8))
    got = np.asarray(degrade_scene_sharded(scene, kernel, mesh, factor=8))
    assert got.shape == (5, 64, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_scene_2d_kernel(mesh, rng):
    """A rank-2 kernel broadcasts across bands (small span: the broadcast
    logic is span-independent and a 13x13 compiles ~100s on this host)."""
    scene = jnp.asarray(rng.normal(size=(5, 128, 64)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 5)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=4))
    got = np.asarray(degrade_scene_sharded(scene, kernel, mesh, factor=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_scene_shape_gate(mesh):
    scene = jnp.zeros((5, 100, 64))
    with pytest.raises(ValueError):
        degrade_scene_sharded(scene, jnp.ones((13, 13)), mesh, factor=8)


@pytest.mark.slow
def test_degrade_scene_uneven_shapes(mesh, rng):
    """The shape-tolerant wrapper: H not a multiple of n_devices*factor
    (edge-replicated row padding), W with a sub-factor remainder (cropped,
    matching the reference's flooring avg-pools). Small span: the
    pad/crop arithmetic is span-independent and f=8/13x13 costs ~2 min
    of 8-shard compile on this host."""
    from kmsr_tpu.parallel.spatial import degrade_scene

    scene = jnp.asarray(rng.normal(5, 2, size=(5, 158, 69)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 5, 5)).astype(np.float32))
    want = np.asarray(degrade(scene[:, :156, :68], kernel, factor=4))
    got = np.asarray(degrade_scene(scene, kernel, mesh, factor=4))
    assert got.shape == (5, 39, 17)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_degrade_scene_cli(tmp_path, rng):
    """Whole-scene pipeline stage: NaN-masked scene in, blurred group out."""
    from kmsr_tpu.io.ncio import read_band_stack, write_band_stack
    from kmsr_tpu.io.schema import GROUP_BLURRED, GROUP_GEO
    from kmsr_tpu.pipeline.degrade_scene import main

    scene = rng.normal(5, 2, size=(5, 144, 80)).astype(np.float32)
    scene[:, :16, :16] = np.nan  # masked corner: two whole 8x8 cells NaN
    write_band_stack(str(tmp_path / "scene.nc"), GROUP_GEO, scene, mode="w")
    np.save(tmp_path / "k.npy", rng.uniform(0, 1, size=(13, 13)).astype(np.float32))

    rc = main([
        "--input", str(tmp_path / "scene.nc"),
        "--kernel", str(tmp_path / "k.npy"),
        "--output-dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    lr = read_band_stack(str(tmp_path / "out" / "scene_blurred.nc"), GROUP_BLURRED)
    assert lr.shape == (5, 18, 10)
    assert np.isnan(lr[:, :2, :2]).all()  # all-NaN footprints restored
    assert np.isfinite(lr[:, 3:, 3:]).all()


def test_degrade_slab_prime_out_rows_narrow_bands(rng):
    """Regression (caught by scripts/tpu_parity.py on hardware): prime
    out_rows forces the band height t down to 1, making the band stride
    s=factor smaller than the kernel's row extension ext — the
    next-band overlap slice then under-supplies rows and the banded
    conv emits 0-height outputs. Such shapes must take the unbanded
    fallback and match the direct strided conv."""
    from kmsr_tpu.ops.degrade import compose_with_box, depthwise_conv2d
    from kmsr_tpu.parallel.spatial import _degrade_slab

    f, k = 4, 13  # ext = 12 > s = 4 when t collapses to 1
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, k, k)).astype(np.float32))
    comp = compose_with_box(kernel, f)
    ext = comp.shape[-1] - f
    hs = 13 * f  # 13 output rows: prime
    xp = jnp.asarray(
        rng.normal(5, 2, size=(2, hs + ext, 48 + ext)).astype(np.float32)
    )
    want = depthwise_conv2d(xp[None], comp, stride=f)[0]
    got = _degrade_slab(xp, comp, f, ext=ext)
    assert got.shape == (2, 13, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharded_small_kernel_matches_single_device(mesh, rng):
    """Fast-tier sharded parity: a small tap lattice keeps the phase
    stencil's trace/compile cheap on the 8-device CPU mesh."""
    scene = jnp.asarray(rng.normal(5, 2, size=(2, 96, 32)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 5, 5)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=4))
    got = np.asarray(degrade_scene_sharded(scene, kernel, mesh, factor=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_sharded_scene_tiles_alias_maps_to_fast(mesh, rng):
    """The removed impl='tiles' name (round-2 configs) is accepted as an
    alias of the raw-slab fast path and reproduces the single-device
    degrade across the 8-way row sharding."""
    scene = jnp.asarray(rng.normal(size=(1, 96, 32)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(1, 5, 5)).astype(np.float32))
    want = np.asarray(degrade(scene, kernel, factor=4))
    got = np.asarray(
        degrade_scene_sharded(scene, kernel, mesh, factor=4, impl="tiles")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
