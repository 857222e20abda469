"""Whole-scene SR via exact halo tiling (`pipeline.sr_scene`).

The key claim under test: tiled reconstruction is EQUAL to the untiled
forward (zero-halo trunk + edge-halo bilinear skip), not approximately
blended — verified in f32 where reduction-order noise is ~1e-6.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.models.sr import SRConfig, init_sr, sr_forward
from kmsr_tpu.pipeline.sr_scene import receptive_halo, sr_scene, sr_scene_folder

CFG = SRConfig(width=8, n_blocks=2, factor=4)


@pytest.fixture(scope="module")
def sr_params():
    return init_sr(jax.random.PRNGKey(0), CFG)


def _global(params, scene):
    out = sr_forward(params, jnp.asarray(scene)[None], CFG,
                     compute_dtype=jnp.float32)
    return np.asarray(out)[0]


def test_tiled_equals_untiled(sr_params, rng):
    scene = rng.normal(3, 1, (5, 48, 80)).astype(np.float32)
    got = sr_scene(sr_params, scene, CFG, tile=32, chunk=3,
                   compute_dtype=jnp.float32)
    want = _global(sr_params, scene)
    assert got.shape == (5, 192, 320)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_tiled_equals_untiled_shifted_last_tile(sr_params, rng):
    # 50 and 70 are NOT multiples of tile=32 -> the last row/col of tiles
    # is anchored at H-tile / W-tile and overlaps; overlap must agree
    scene = rng.normal(3, 1, (5, 50, 70)).astype(np.float32)
    got = sr_scene(sr_params, scene, CFG, tile=32, chunk=4,
                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(got, _global(sr_params, scene),
                               atol=2e-5, rtol=1e-5)


def test_scene_smaller_than_tile(sr_params, rng):
    scene = rng.normal(3, 1, (5, 20, 24)).astype(np.float32)
    got = sr_scene(sr_params, scene, CFG, tile=64, compute_dtype=jnp.float32)
    np.testing.assert_allclose(got, _global(sr_params, scene),
                               atol=2e-5, rtol=1e-5)


def test_insufficient_halo_breaks_exactness(sr_params, rng):
    """Sanity check on the receptive-field bound: a halo of 1 must NOT
    reproduce the untiled forward (otherwise the test above is vacuous)."""
    scene = rng.normal(3, 1, (5, 48, 48)).astype(np.float32)
    got = sr_scene(sr_params, scene, CFG, tile=16, halo=1,
                   compute_dtype=jnp.float32)
    assert not np.allclose(got, _global(sr_params, scene), atol=2e-5)
    assert receptive_halo(CFG) == 8


def test_nan_footprint_restored(sr_params, rng):
    scene = rng.normal(3, 1, (5, 40, 40)).astype(np.float32)
    scene[:, 10:14, 20:22] = np.nan
    got = sr_scene(sr_params, scene, CFG, tile=32, compute_dtype=jnp.float32)
    f = CFG.factor
    assert np.isnan(got[:, 10 * f : 14 * f, 20 * f : 22 * f]).all()
    nan_frac_in = np.isnan(scene).mean()
    assert np.isnan(got).mean() == pytest.approx(nan_frac_in)


@pytest.mark.slow
def test_data_parallel_tiles(sr_params, rng):
    from kmsr_tpu.parallel import make_mesh

    scene = rng.normal(3, 1, (5, 64, 64)).astype(np.float32)
    mesh = make_mesh(axis_names=("data",))
    got = sr_scene(sr_params, scene, CFG, tile=16, chunk=8, mesh=mesh,
                   compute_dtype=jnp.float32)
    np.testing.assert_allclose(got, _global(sr_params, scene),
                               atol=2e-5, rtol=1e-5)


def test_sr_scene_folder_cli(tmp_path, sr_params, rng):
    from kmsr_tpu.io.ncio import read_band_stack, write_band_stack
    from kmsr_tpu.utils.params_io import save_params

    scene = rng.normal(3, 1, (5, 40, 40)).astype(np.float32)
    src = tmp_path / "scene.nc"
    write_band_stack(str(src), "lr", scene, mode="w")
    model = tmp_path / "sr_model.npz"
    save_params(str(model), sr_params)

    from kmsr_tpu.pipeline.sr_scene import main

    rc = main(["--input", str(src), "--model", str(model),
               "--output-dir", str(tmp_path / "out"), "--factor", "4",
               "--width", "8", "--n-blocks", "2", "--tile", "32"])
    assert rc == 0
    out = read_band_stack(str(tmp_path / "out" / "scene.nc"), "sr")
    assert out.shape == (5, 160, 160)
    assert np.isfinite(out).all()
