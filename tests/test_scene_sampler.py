"""Gradient-weighted whole-scene patch sampling.

Parity target: `trash/data_single_GOCI.py` (KernelGAN-style sampler:
percentile-normalized scene load, gradient weight map, NaN-avoiding patch
draws — reference self-test at `trash/data_single_GOCI.py:258-271`).
"""
import numpy as np
import pytest

from kmsr_tpu.data import (
    gradient_weight_map,
    load_scene_bands,
    sample_scene_patches,
)
from kmsr_tpu.data.sampler import _valid_window_map
from kmsr_tpu.io.ncio import write_band_stack


def _holed_scene(rng, h=200, w=300, n_holes=10):
    img = rng.random((5, h, w), dtype=np.float32)
    valid = np.ones((h, w), bool)
    for _ in range(n_holes):
        y, x = rng.integers(0, h - 20), rng.integers(0, w - 20)
        hh, ww = rng.integers(5, 20), rng.integers(5, 20)
        valid[y : y + hh, x : x + ww] = False
    img[:, ~valid] = np.nan
    return img, valid


def test_gradient_weight_map_is_probability(rng):
    img = rng.random((5, 64, 64), dtype=np.float32)
    p = gradient_weight_map(img)
    assert p.shape == (64, 64)
    assert np.all(p >= 0)
    assert np.isclose(p.sum(), 1.0, atol=1e-5)


def test_gradient_weight_map_prefers_edges():
    img = np.zeros((1, 32, 32), np.float32)
    img[:, :, 16:] = 1.0  # one vertical edge
    p = gradient_weight_map(img)
    # probability mass concentrates on the edge column
    assert p[:, 15].sum() > 10 * p[:, 5].sum()


def test_gradient_weight_map_zeroes_invalid(rng):
    img = rng.random((2, 32, 32), dtype=np.float32)
    valid = np.ones((32, 32), bool)
    valid[:, :16] = False
    p = gradient_weight_map(img, valid)
    assert p[:, :16].max() == pytest.approx(0.0, abs=1e-12)
    assert np.isclose(p.sum(), 1.0, atol=1e-5)


def test_valid_window_map_matches_bruteforce(rng):
    valid = rng.random((40, 50)) > 0.1
    ps = 8
    ok = _valid_window_map(valid, ps)
    assert ok.shape == (33, 43)
    for _ in range(50):
        y, x = rng.integers(0, 33), rng.integers(0, 43)
        assert ok[y, x] == valid[y : y + ps, x : x + ps].all()


def test_sampled_patches_fully_valid(rng):
    img, valid = _holed_scene(rng)
    patches = sample_scene_patches(rng, img, patch_size=32, batch_size=16)
    assert patches.shape == (16, 5, 32, 32)
    assert np.isfinite(patches).all()  # never touches a NaN hole


def test_sample_raises_when_no_valid_window(rng):
    img = rng.random((5, 64, 64), dtype=np.float32)
    valid = np.zeros((64, 64), bool)
    valid[::8, ::8] = True  # valid pixels exist, but no 16x16 window is clean
    img[:, ~valid] = np.nan
    with pytest.raises(ValueError, match="no fully-valid"):
        sample_scene_patches(rng, img, 16, 4, valid_mask=valid)


def test_sample_too_small_scene(rng):
    with pytest.raises(ValueError, match="smaller than patch"):
        sample_scene_patches(rng, rng.random((5, 16, 16)), 32, 1)


def test_load_scene_bands_normalized(tmp_path, rng):
    img, valid = _holed_scene(rng, h=96, w=96, n_holes=4)
    img = img * 7.0 + 1.0  # radiance-ish scale
    path = str(tmp_path / "scene.nc")
    write_band_stack(path, "geophysical_data", np.nan_to_num(img, nan=-9999.0),
                     mode="w")
    out, mask = load_scene_bands(path)
    assert out.shape == img.shape and mask.shape == valid.shape
    assert np.array_equal(mask, valid)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()  # invalid filled with 0
    assert out[:, ~mask].max() == pytest.approx(0.0)
    # normalization preserves within-band ordering on valid pixels
    b = img[0][valid]
    o = out[0][valid]
    i, j = np.argmin(b), np.argmax(b)
    assert o[i] <= o[j]


def test_end_to_end_scene_sampling(tmp_path, rng):
    img, _ = _holed_scene(rng, h=128, w=128, n_holes=3)
    path = str(tmp_path / "scene.nc")
    write_band_stack(path, "geophysical_data", np.nan_to_num(img, nan=-9999.0),
                     mode="w")
    scene, mask = load_scene_bands(path)
    patches = sample_scene_patches(rng, scene, 32, 8, valid_mask=mask)
    assert patches.shape == (8, 5, 32, 32)
    assert np.isfinite(patches).all()


@pytest.mark.slow
def test_pool_from_scene_and_training(tmp_path, rng):
    """KernelGAN single-image mode: a PatchPool drawn from one scene feeds
    the standard trainer (parity+: trash/data_single_GOCI.py was the
    reference's abandoned single-image sampler; here it is a first-class
    input mode)."""
    from kmsr_tpu.data import PatchPool
    from kmsr_tpu.models import DiscriminatorConfig, GeneratorConfig
    from kmsr_tpu.train import SingleKernelConfig, train_single_kernel

    img, _ = _holed_scene(rng, h=256, w=256, n_holes=4)
    img = img * 6.0 + 1.0
    path = str(tmp_path / "scene.nc")
    write_band_stack(path, "geophysical_data", np.nan_to_num(img, nan=-9999.0),
                     mode="w")
    pool = PatchPool.from_scene(path, patch_size=64, n_patches=8, seed=1)
    assert pool.shape == (8, 5, 64, 64)
    assert np.isfinite(pool.patches).all()

    cfg = SingleKernelConfig(
        iters=2, hr_patch_size=64, lr_crop_size=8, batch_size=4,
        log_every=2, kernel_log_every=2, outdir=str(tmp_path / "out"),
        verbose=False,
        generator=GeneratorConfig(mid_ch=8),
        discriminator=DiscriminatorConfig(base_ch=8, num_blocks=2),
    )
    out = train_single_kernel(pool, cfg, progress=False)
    k = out["kernel_per_band"]
    assert k.shape == (5, 13, 13) and np.isfinite(k).all()
    np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-4)


def test_from_scene_raw_units(tmp_path, rng):
    from kmsr_tpu.data import PatchPool

    img = rng.uniform(3.0, 9.0, (5, 96, 96)).astype(np.float32)
    path = str(tmp_path / "scene.nc")
    write_band_stack(path, "geophysical_data", img, mode="w")
    pool = PatchPool.from_scene(path, patch_size=32, n_patches=4,
                                normalize=False)
    # radiance units preserved (not squashed to [0,1])
    assert pool.patches.max() > 2.0
