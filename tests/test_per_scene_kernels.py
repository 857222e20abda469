"""Per-scene kernel workflow: scene grouping, fleet-outdir kernel routing.

The reference's actual single-kernel workflow trains one KernelGAN PER
scene (`single_kernel/train.py` run once per scene) and applies each
scene's kernel to that scene's patches (`C_30...py` with per-scene
paths). Here: the cutter's name contract makes the originating scene
recoverable from any stage file (`data.patches.scene_prefix`), the fleet
trainer writes `<outdir>/<scene>/kernel_per_band.npy`, and the factory /
apply_kernel stages route each file through ITS scene's kernel via
`--kernel-root`.
"""
import os

import numpy as np
import pytest

from kmsr_tpu.data.patches import group_by_scene, scene_prefix
from kmsr_tpu.data.sampler import PatchPool
from kmsr_tpu.io.ncio import read_band_stack, write_band_stack
from kmsr_tpu.io.schema import GROUP_BLURRED, GROUP_DENOISED, GROUP_LR


def test_scene_prefix_contract():
    # cutter stem + every downstream tag combination
    assert scene_prefix("d/LC08_T1_003_007.nc") == "LC08_T1"
    assert scene_prefix("sceneB_000_001.npy") == "sceneB"
    assert scene_prefix("sceneB_000_001_denoised.nc") == "sceneB"
    assert scene_prefix("sceneB_000_001_blurred.nc") == "sceneB"
    assert scene_prefix("sceneB_000_001_denoised_train.nc") == "sceneB"
    # not cutter-named: returned whole (tag-stripped)
    assert scene_prefix("whole_scene.nc") == "whole_scene"
    # a short numeric tail is NOT grid indices (cutter pads to >=3 digits)
    assert scene_prefix("scene_2021_01.nc") == "scene_2021_01"
    # a digit-bearing scene id must not lose its own tokens
    assert scene_prefix("LC08_L1TP_115035_20210317_02_T1_004_005.nc") == (
        "LC08_L1TP_115035_20210317_02_T1"
    )
    # a pathrow+date tail (6/8 digits) is NOT grid indices: two scenes
    # differing only in those tokens must not collapse into one group
    assert scene_prefix("LC08_L1TP_115035_20210317.nc") == (
        "LC08_L1TP_115035_20210317"
    )
    assert scene_prefix("LC08_L1TP_116036_20210501.nc") == (
        "LC08_L1TP_116036_20210501"
    )
    # 4-digit grid indices (grids past 999 rows) still strip
    assert scene_prefix("big_1000_0042.nc") == "big"


def test_group_by_scene_orders_and_partitions():
    files = [
        "p/a_000_000.nc", "p/a_000_001.nc", "p/b_000_000.nc",
        "p/a_001_000.nc",
    ]
    groups = group_by_scene(files)
    assert list(groups) == ["a", "b"]
    assert groups["a"] == ["p/a_000_000.nc", "p/a_000_001.nc",
                           "p/a_001_000.nc"]
    assert groups["b"] == ["p/b_000_000.nc"]


def test_patch_pool_from_files(tmp_path, rng):
    paths = []
    for i in range(3):
        p = tmp_path / f"s_{i:03d}_000.npy"
        np.save(p, rng.normal(5, 1, (5, 16, 16)).astype(np.float32))
        paths.append(str(p))
    pool = PatchPool.from_files(paths)
    assert pool.patches.shape == (3, 5, 16, 16)
    nc = tmp_path / "s_003_000.nc"
    write_band_stack(str(nc), GROUP_DENOISED,
                     rng.normal(5, 1, (5, 16, 16)).astype(np.float32),
                     mode="w")
    mixed = PatchPool.from_files(paths + [str(nc)])
    assert mixed.patches.shape == (4, 5, 16, 16)
    with pytest.raises(ValueError):
        PatchPool.from_files([])


def _make_patch_dir(tmp_path, rng, scenes=("sceneA", "sceneB"), n=2, size=32):
    d = tmp_path / "patches"
    d.mkdir()
    for s in scenes:
        for i in range(n):
            x = rng.normal(5, 1, (5, size, size)).astype(np.float32)
            write_band_stack(
                str(d / f"{s}_{i:03d}_000_denoised.nc"), GROUP_DENOISED, x,
                mode="w",
            )
    return d


def _make_kernel_root(tmp_path, rng, scenes=("sceneA", "sceneB")):
    root = tmp_path / "fleet_out"
    kernels = {}
    for s in scenes:
        os.makedirs(root / s)
        k = rng.uniform(0, 1, (5, 13, 13)).astype(np.float32)
        k /= k.sum(axis=(1, 2), keepdims=True)
        np.save(root / s / "kernel_per_band.npy", k)
        kernels[s] = k
    return root, kernels


def test_factory_kernel_root_routes_per_scene(tmp_path, rng):
    from kmsr_tpu.pipeline.factory import run_factory, scene_seed

    patches = _make_patch_dir(tmp_path, rng)
    root, _ = _make_kernel_root(tmp_path, rng)
    pool_file = tmp_path / "pool.npy"
    np.save(pool_file, rng.normal(0, 0.01, (4, 5, 4, 4)).astype(np.float32))

    out = tmp_path / "pairs"
    rep = run_factory(
        str(patches), None, str(pool_file), str(out),
        kernel_root=str(root), backend="xla", progress=False,
    )
    assert rep.n_fail == 0 and rep.n_ok == 4

    # per-scene reference: the SAME files through run_factory with that
    # scene's kernel (and its derived noise seed — each scene gets its
    # OWN stream, not a shared one) must reproduce the routed outputs
    for scene in ("sceneA", "sceneB"):
        ref_out = tmp_path / f"ref_{scene}"
        scene_files = sorted(
            str(p) for p in patches.glob(f"{scene}_*.nc")
        )
        run_factory(
            str(patches), str(root / scene / "kernel_per_band.npy"),
            str(pool_file), str(ref_out), backend="xla", progress=False,
            files=scene_files, seed=scene_seed(42, scene),
        )
        for p in sorted(ref_out.glob("*.nc")):
            got = read_band_stack(str(out / p.name), GROUP_LR)
            np.testing.assert_array_equal(
                got, read_band_stack(str(p), GROUP_LR)
            )
    # seed derivation is name-keyed: distinct scenes -> distinct streams
    assert scene_seed(42, "sceneA") != scene_seed(42, "sceneB")

    # distinct kernels -> the two scenes' outputs genuinely differ
    a = read_band_stack(
        str(out / "sceneA_000_000_denoised_train.nc"), GROUP_LR
    )
    b = read_band_stack(
        str(out / "sceneB_000_000_denoised_train.nc"), GROUP_LR
    )
    assert np.abs(a - b).max() > 1e-3


def test_factory_kernel_root_missing_scene_fails_as_unit(tmp_path, rng):
    from kmsr_tpu.pipeline.factory import run_factory

    patches = _make_patch_dir(tmp_path, rng)
    root, _ = _make_kernel_root(tmp_path, rng, scenes=("sceneA",))
    pool_file = tmp_path / "pool.npy"
    np.save(pool_file, rng.normal(0, 0.01, (4, 5, 4, 4)).astype(np.float32))
    rep = run_factory(
        str(patches), None, str(pool_file), str(tmp_path / "pairs"),
        kernel_root=str(root), backend="xla", progress=False,
    )
    assert rep.n_ok == 2  # sceneA proceeds
    assert rep.n_fail == 2  # sceneB's files fail with the missing-kernel msg
    assert all("sceneB" in msg for _, msg in rep.failed)


def test_factory_requires_exactly_one_kernel_source(tmp_path, rng):
    from kmsr_tpu.pipeline.factory import run_factory

    patches = _make_patch_dir(tmp_path, rng)
    pool_file = tmp_path / "pool.npy"
    np.save(pool_file, rng.normal(0, 0.01, (4, 5, 4, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="exactly one"):
        run_factory(str(patches), "k.npy", str(pool_file),
                    str(tmp_path / "o"), kernel_root="root", progress=False)
    with pytest.raises(ValueError, match="exactly one"):
        run_factory(str(patches), None, str(pool_file),
                    str(tmp_path / "o"), progress=False)


def test_apply_kernel_kernel_root(tmp_path, rng):
    from kmsr_tpu.pipeline.apply_kernel import apply_kernel_to_folder

    patches = _make_patch_dir(tmp_path, rng)
    root, kernels = _make_kernel_root(tmp_path, rng)
    out = tmp_path / "blurred"
    rep = apply_kernel_to_folder(
        str(patches), None, str(out), kernel_root=str(root), progress=False,
    )
    assert rep.n_fail == 0 and rep.n_ok == 4

    from kmsr_tpu.ops.degrade import degrade_strided

    for scene in ("sceneA", "sceneB"):
        src = patches / f"{scene}_000_000_denoised.nc"
        got = read_band_stack(
            str(out / f"{scene}_000_000_denoised_blurred.nc"), GROUP_BLURRED
        )
        want = np.asarray(degrade_strided(
            read_band_stack(str(src), GROUP_DENOISED)[None],
            kernels[scene], factor=8,
        ))[0]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
