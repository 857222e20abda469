"""Orchestrator: the full DAG from one JSON config on synthetic scenes."""
import json
import os

import numpy as np
import pytest

from kmsr_tpu.io import NCFile, write_band_stack
from kmsr_tpu.io.schema import GROUP_GEO
from kmsr_tpu.pipeline.run_all import main, run_pipeline


@pytest.fixture
def scenes(tmp_path, rng):
    d = tmp_path / "scenes"
    d.mkdir()
    for i in range(2):
        scene = rng.uniform(0.5, 5.0, size=(5, 80, 80)).astype(np.float32)
        scene[4] = 1.0  # NIR inside the water-mask window
        write_band_stack(str(d / f"s{i}.nc"), GROUP_GEO, scene, mode="w")
        with NCFile(str(d / f"s{i}.nc"), "a") as f:
            nav = np.linspace(30, 31, 80 * 80).reshape(80, 80).astype(np.float32)
            f.create_variable("navigation_data", "latitude", nav, dims=("y", "x"))
            f.create_variable("navigation_data", "longitude", nav, dims=("y", "x"))
    return d


def tiny_config(tmp_path, scenes) -> dict:
    return {
        "workdir": str(tmp_path / "run"),
        "input_dir": str(scenes),
        "trainer": "single",
        "stages": {
            "cut": {"patch_size": 32, "stride_ratio": 1.0},
            "denoise": {"h_factor": 1.0, "device_batch": 4},
            "noise_pool": {"patch_size": 4, "samples_per_file": 2},
            "train_kernel": {
                "iters": 2, "batch_size": 2, "lr_crop_size": 4,
                "log_every": 2, "kernel_log_every": 2,
            },
            "factory": {"factor": 8},
            "check_shapes": {"size": 4},
            "sr_train": {"enabled": False},
            "sr_infer": {"enabled": False},
        },
    }


@pytest.mark.slow
def test_run_all_dag(tmp_path, scenes):
    timings = run_pipeline(tiny_config(tmp_path, scenes))
    assert list(timings) == [
        "cut", "denoise", "noise_pool", "train_kernel", "factory",
        "check_shapes", "analyze",
    ]
    run = tmp_path / "run"
    assert (run / "kernel_run" / "kernel_per_band.npy").exists()
    assert (run / "noise_pool.npy").exists()
    pairs = [p for p in os.listdir(run / "train_pairs") if p.endswith(".nc")]
    assert pairs
    k = np.load(run / "kernel_run" / "kernel_per_band.npy")
    assert k.shape == (5, 13, 13)
    np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-4)


def test_run_all_cli_roundtrip(tmp_path, scenes):
    """--write-config template runs as-is after shrinking; --only subsets."""
    cfg_path = tmp_path / "pipeline.json"
    assert main(["--write-config", str(cfg_path)]) == 0
    cfg = json.loads(cfg_path.read_text())
    cfg.update(tiny_config(tmp_path, scenes))
    # stage dicts must merge over template defaults, not replace them
    cfg_path.write_text(json.dumps(cfg))
    rc = main(["--config", str(cfg_path), "--only", "cut,denoise"])
    assert rc == 0
    assert (tmp_path / "run" / "patches").is_dir()
    assert (tmp_path / "run" / "denoised").is_dir()
    assert not (tmp_path / "run" / "train_pairs").exists()


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical: test_run_all_dag (DAG mechanics) + test_per_scene_kernels.py + test_train_fleet.py (fleet route)
def test_run_all_fleet_trainer_per_scene_kernels(tmp_path, scenes):
    """trainer='fleet' is the reference's ACTUAL workflow — one kernel per
    scene — end-to-end: the fleet trainer writes <scene>/kernel_per_band.npy
    per input scene, the fused factory degrades each scene's patches with
    ITS kernel, and analyze covers every scene's log."""
    cfg = tiny_config(tmp_path, scenes)
    cfg["trainer"] = "fleet"
    timings = run_pipeline(cfg)
    assert list(timings) == [
        "cut", "denoise", "noise_pool", "train_kernel", "factory",
        "check_shapes", "analyze",
    ]
    run = tmp_path / "run"
    for scene in ("s0", "s1"):
        k = np.load(run / "kernel_run" / scene / "kernel_per_band.npy")
        assert k.shape == (5, 13, 13)
        np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-4)
        assert (run / "kernel_run" / scene / "training_log.txt").exists()
    pairs = [p for p in os.listdir(run / "train_pairs") if p.endswith(".nc")]
    assert pairs
    # every input scene produced pairs (per-scene routing covered both)
    from kmsr_tpu.data.patches import scene_prefix

    assert {scene_prefix(p) for p in pairs} == {"s0", "s1"}


def test_run_all_rejects_bad_trainer(tmp_path, scenes):
    cfg = tiny_config(tmp_path, scenes)
    cfg["trainer"] = "bogus"
    with pytest.raises(ValueError):
        run_pipeline(cfg)


def test_run_all_rejects_bad_real_lr_configs(tmp_path, scenes):
    """real_is_lr needs trainer 'fleet' AND the cut_lr stage; cut_lr
    needs lr_input_dir."""
    cfg = tiny_config(tmp_path, scenes)
    cfg["stages"]["cut_lr"] = {"enabled": True}
    with pytest.raises(ValueError, match="lr_input_dir"):
        run_pipeline(cfg)
    cfg = tiny_config(tmp_path, scenes)
    cfg["trainer"] = "fleet"
    cfg["stages"]["train_kernel"]["real_is_lr"] = True
    with pytest.raises(ValueError, match="cut_lr"):
        run_pipeline(cfg)
    cfg = tiny_config(tmp_path, scenes)
    cfg["stages"]["train_kernel"]["real_is_lr"] = True  # trainer=single
    with pytest.raises(ValueError, match="fleet"):
        run_pipeline(cfg)


@pytest.mark.slow
@pytest.mark.exhaustive  # default tier keeps the rejection tests + the fleet real_is_lr unit/equivalence tests; this is the end-to-end route spelling
def test_run_all_fleet_real_is_lr_route(tmp_path, scenes, rng):
    """The FLAGSHIP configuration end-to-end (VERDICT r4 item 2 plumbing):
    cut_lr cuts native-LR scenes into per-scene pools, the fleet trains
    with them as the D's real side (real_is_lr), and the factory routes
    per-scene kernels."""
    lr_dir = tmp_path / "scenes_lr"
    lr_dir.mkdir()
    for i in range(2):
        lr_scene = rng.uniform(0.5, 5.0, size=(5, 10, 10)).astype(np.float32)
        lr_scene[4] = 1.0
        write_band_stack(str(lr_dir / f"s{i}.nc"), GROUP_GEO, lr_scene,
                         mode="w")
    cfg = tiny_config(tmp_path, scenes)
    cfg["trainer"] = "fleet"
    cfg["lr_input_dir"] = str(lr_dir)
    cfg["stages"]["cut_lr"] = {
        "enabled": True, "patch_size": 4, "stride_ratio": 1.0,
        "nan_threshold": 0.0,
    }
    cfg["stages"]["train_kernel"]["real_is_lr"] = True
    timings = run_pipeline(cfg)
    assert list(timings) == [
        "cut", "cut_lr", "denoise", "noise_pool", "train_kernel",
        "factory", "check_shapes", "analyze",
    ]
    run = tmp_path / "run"
    assert os.listdir(run / "patches_lr")
    for scene in ("s0", "s1"):
        k = np.load(run / "kernel_run" / scene / "kernel_per_band.npy")
        assert k.shape == (5, 13, 13)
        np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-4)
    pairs = [p for p in os.listdir(run / "train_pairs") if p.endswith(".nc")]
    from kmsr_tpu.data.patches import scene_prefix

    assert {scene_prefix(p) for p in pairs} == {"s0", "s1"}


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical: test_run_all_dag (DAG mechanics) + test_factory_moe_mode + test_train_moe_smoke (moe route)
def test_run_all_moe_trainer_content_adaptive_factory(tmp_path, scenes):
    """trainer='moe' routes the fused factory through --moe (selector-
    routed expert kernels) instead of a single kernel artifact."""
    cfg = tiny_config(tmp_path, scenes)
    cfg["trainer"] = "moe"
    cfg["stages"]["train_kernel"] = {
        "iters": 2, "batch_size": 2, "n_kernels": 3, "factor": 4,
        "format": "nc",
    }
    cfg["stages"]["factory"] = {"factor": 8}
    timings = run_pipeline(cfg)
    assert "factory" in timings and "analyze" not in timings
    run = tmp_path / "run"
    assert (run / "kernel_run" / "moe_model.npz").exists()
    assert (run / "kernel_run" / "moe_state.npz").exists()
    pairs = [p for p in os.listdir(run / "train_pairs") if p.endswith(".nc")]
    assert pairs
    # every pair carries its expert-selection provenance
    with NCFile(str(run / "train_pairs" / pairs[0]), "r") as f:
        assert 0 <= int(f.get_attrs(group="lr")["moe_expert"]) < 3


@pytest.mark.slow
def test_run_all_calibrate_head_stage(tmp_path, rng):
    """One config drives raw TIF+MTL -> TOA .nc -> patches -> kernel ->
    train pairs (the reference DAG's head, `A_00Landsat_cal_rad.py:195-209`,
    folded into the orchestrator)."""
    from tests.helpers.landsat_fixtures import make_landsat_scene

    root = tmp_path / "landsat"
    root.mkdir()
    make_landsat_scene(root / "LC08_L1TP_syn1", rng, shape=(48, 64))

    cfg = tiny_config(tmp_path, scenes="IGNORED")
    cfg["landsat_root"] = str(root)
    cfg["stages"]["calibrate"] = {"enabled": True, "mode": "rad"}
    timings = run_pipeline(cfg)
    assert list(timings)[:2] == ["calibrate", "cut"]
    run = tmp_path / "run"
    cal = [p for p in os.listdir(run / "calibrated") if p.endswith(".nc")]
    assert len(cal) == 1 and "TOA_RAD" in cal[0]
    assert (run / "kernel_run" / "kernel_per_band.npy").exists()
    pairs = [p for p in os.listdir(run / "train_pairs") if p.endswith(".nc")]
    assert pairs


def test_run_all_calibrate_requires_root(tmp_path, scenes):
    cfg = tiny_config(tmp_path, scenes)
    cfg["stages"]["calibrate"] = {"enabled": True}
    with pytest.raises(ValueError, match="landsat_root"):
        run_pipeline(cfg)


def test_run_all_resume_markers(tmp_path, scenes):
    """--resume skips completed stages via argv-keyed markers; a changed
    stage config invalidates its marker and re-runs the stage."""
    cfg = tiny_config(tmp_path, scenes)

    t1 = run_pipeline(cfg, only=["cut"], resume=True)
    assert list(t1) == ["cut"]
    assert (tmp_path / "run" / ".stages" / "cut.json").exists()

    t2 = run_pipeline(cfg, only=["cut"], resume=True)
    assert t2 == {}  # marker matched -> skipped

    # without --resume the marker is ignored
    t3 = run_pipeline(cfg, only=["cut"])
    assert list(t3) == ["cut"]

    # a config change must re-run the stage
    cfg["stages"]["cut"]["patch_size"] = 16
    t4 = run_pipeline(cfg, only=["cut"], resume=True)
    assert list(t4) == ["cut"]


@pytest.mark.slow
def test_run_all_resume_downstream_invalidation(tmp_path, scenes):
    """When an upstream stage re-executes, --resume must NOT serve
    downstream outputs computed from the old upstream data: each marker
    records the keys of every upstream marker (make-style chain), so a
    re-made upstream marker invalidates all later ones even though their
    own argv (workdir-derived paths) is unchanged."""
    cfg = tiny_config(tmp_path, scenes)
    t1 = run_pipeline(cfg, only=["cut", "denoise"], resume=True)
    assert list(t1) == ["cut", "denoise"]
    t2 = run_pipeline(cfg, only=["cut", "denoise"], resume=True)
    assert t2 == {}
    # upstream config change: cut re-runs AND denoise re-runs although
    # denoise's own argv is identical
    cfg["stages"]["cut"]["stride_ratio"] = 0.5
    t3 = run_pipeline(cfg, only=["cut", "denoise"], resume=True)
    assert list(t3) == ["cut", "denoise"]
    # a partial --only re-run of an upstream stage also invalidates:
    # cut's fresh marker is itself valid, but denoise's recorded chain
    # points at the old cut key
    run_pipeline(cfg, only=["cut"])
    t4 = run_pipeline(cfg, only=["cut", "denoise"], resume=True)
    assert list(t4) == ["denoise"]
