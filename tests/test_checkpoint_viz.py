"""Checkpoint/resume, profiling utilities, and viz-CLI tests."""
import numpy as np
import pytest

from kmsr_tpu.data import synthetic_pool
from kmsr_tpu.models import DiscriminatorConfig, GeneratorConfig
from kmsr_tpu.train import SingleKernelConfig, train_single_kernel


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    pool = synthetic_pool(np.random.default_rng(0), n=4, size=32, blur_sigma=None)

    def cfg(iters):
        return SingleKernelConfig(
            iters=iters,
            batch_size=2,
            hr_patch_size=32,
            lr_crop_size=4,
            log_every=2,
            kernel_log_every=100,
            ckpt_every=2,
            resume=True,
            outdir=str(tmp_path),
            verbose=False,
            generator=GeneratorConfig(mid_ch=4),
            discriminator=DiscriminatorConfig(base_ch=8, num_blocks=1),
        )

    out1 = train_single_kernel(pool, cfg(2), progress=False)
    assert (tmp_path / "ckpt" / "step_2").exists()
    # resume: continue to 4 iters; step counter must carry over
    out2 = train_single_kernel(pool, cfg(4), progress=False)
    assert int(out2["state"].step) == 4
    # log file keeps rows from both runs (header written only once)
    lines = (tmp_path / "training_log.txt").read_text().splitlines()
    assert lines.count("Iteration,Loss_D,Loss_G_adv,Loss_Reg,Loss_Reg_weighted") == 1
    assert [l.split(",")[0] for l in lines[1:]] == ["1", "2", "3", "4"]


def test_stage_timer():
    from kmsr_tpu.utils.profiling import stage_timer, timing_report

    with stage_timer("unit_test_stage"):
        sum(range(1000))
    rep = timing_report(reset=True)
    assert rep["unit_test_stage"]["calls"] == 1
    assert rep["unit_test_stage"]["total_s"] >= 0


def test_detect_sync_stall():
    """The wedged-session taint detector (VERDICT r4 item 1): a stage
    whose device_sync dwarfs its host scopes is flagged; a clean stage
    (r4 session-1 shape) and legit first-compile syncs are not."""
    from kmsr_tpu.utils.profiling import detect_sync_stall

    def rec(s):
        return {"calls": 1, "total_s": s, "mean_s": s, "max_s": s}

    # the r4 incident shape: factory wedged (sync 555.95 vs ~23 s host),
    # denoise clean in the same session
    scopes = {
        "factory.device_sync": rec(555.95),
        "factory.host_write": rec(19.0),
        "factory.host_read_bg": rec(40.0),   # overlapped, must not rescue
        "denoise.device_sync": rec(35.0),
        "denoise.host_write": rec(30.0),
        "denoise.host_read": rec(22.0),
    }
    flags = detect_sync_stall(scopes, {"factory": 580.0, "denoise": 95.0})
    assert [f["stage"] for f in flags] == ["factory"]
    assert flags[0]["device_sync_s"] == 555.95
    assert flags[0]["host_s"] == 19.0  # _bg excluded
    # clean session: sync below both the ratio and the floor
    clean = {
        "factory.device_sync": rec(45.0),
        "factory.host_write": rec(20.0),
        "denoise.device_sync": rec(35.0),
        "denoise.host_write": rec(30.0),
    }
    assert detect_sync_stall(clean, {}) == []
    # first-compile-only stage: large-ish sync with zero host work but
    # under the floor -> not flagged
    assert detect_sync_stall({"factory.device_sync": rec(100.0)}, {}) == []
    # over the floor with zero host work -> flagged, ratio None
    f = detect_sync_stall({"factory.device_sync": rec(130.0)}, {})
    assert f and f[0]["sync_to_host_ratio"] is None


def test_viz_cli_kernels_and_moe(tmp_path, rng, capsys):
    from kmsr_tpu.analysis.viz_cli import main

    kdir = tmp_path / "kernels"
    kdir.mkdir()
    np.save(kdir / "kernel_per_band.npy", rng.uniform(0, 1, (5, 13, 13)))
    np.save(kdir / "kernel_merged.npy", rng.uniform(0, 1, (13, 13)))
    rc = main(["kernels", "--input-dir", str(kdir), "--output-dir", str(tmp_path / "kp")])
    assert rc == 0
    assert len(list((tmp_path / "kp").glob("*.png"))) == 2

    moe = tmp_path / "moe"
    moe.mkdir()
    for i in range(3):
        np.save(moe / f"kernel_{i}.npy", rng.uniform(0, 1, (5, 13, 13)))
        np.save(moe / f"sigma_{i}.npy", rng.uniform(0.1, 1, (5,)))
    rc = main(["moe", "--moe-dir", str(moe), "--output-dir", str(tmp_path / "mo")])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3 kernels" in out and "mean sigma per band" in out


def test_viz_cli_patch_and_nir(tmp_path, rng, capsys):
    from kmsr_tpu.analysis.viz_cli import main
    from kmsr_tpu.io import GROUP_GEO, write_band_stack

    f = tmp_path / "p.nc"
    stack = rng.uniform(0.5, 5, (5, 32, 32)).astype(np.float32)
    stack[4, :10] = 50.0  # bright NIR -> masked
    write_band_stack(f, GROUP_GEO, stack, mode="w")
    rc = main(["patch", str(f), "--output", str(tmp_path / "p.png")])
    assert rc == 0 and (tmp_path / "p.png").exists()
    rc = main(["nir", str(f), "--output", str(tmp_path / "n.png")])
    assert rc == 0 and (tmp_path / "n.png").exists()
    assert "water" in capsys.readouterr().out


def test_viz_hist_compare(tmp_path):
    """Distribution-comparison histograms: two-file same-group mode and
    one-file hr-vs-lr density mode (compare_490_hist / compare_490_hr_lr)."""
    from kmsr_tpu.analysis.viz_cli import main as viz_main
    from kmsr_tpu.io import GROUP_GEO, GROUP_HR, GROUP_LR, write_band_stack

    rng = np.random.default_rng(0)
    a = tmp_path / "a.nc"
    b = tmp_path / "b.nc"
    write_band_stack(a, GROUP_GEO, rng.normal(3, 1, (5, 24, 24)).astype(np.float32), mode="w")
    write_band_stack(b, GROUP_GEO, rng.normal(4, 1, (5, 24, 24)).astype(np.float32), mode="w")
    out1 = tmp_path / "two_files.png"
    assert viz_main(["hist", str(a), "--file-b", str(b), "--output", str(out1)]) == 0
    assert out1.exists() and out1.stat().st_size > 0

    pair = tmp_path / "pair.nc"
    write_band_stack(pair, GROUP_HR, rng.normal(3, 1, (5, 24, 24)).astype(np.float32), mode="w")
    write_band_stack(pair, GROUP_LR, rng.normal(3, 1, (5, 3, 3)).astype(np.float32), mode="a")
    out2 = tmp_path / "hr_lr.png"
    assert viz_main(["hist", str(pair), "--group", "hr", "--group-b", "lr",
                     "--density", "--output", str(out2)]) == 0
    assert out2.exists() and out2.stat().st_size > 0


def test_viz_cli_rgb_and_annotated_kernels(tmp_path, rng, capsys):
    """RGB quicklooks (visualize_all_patches.py parity) for a folder of
    .npy patches and a single .nc patch; annotated kernel rendering
    (visualize_kernels.py parity)."""
    from kmsr_tpu.analysis.viz_cli import main
    from kmsr_tpu.io import GROUP_GEO, write_band_stack

    pdir = tmp_path / "patches"
    pdir.mkdir()
    for i in range(3):
        np.save(pdir / f"p{i}.npy", rng.uniform(0, 8, (5, 16, 16)).astype(np.float32))
    rc = main(["rgb", str(pdir)])
    assert rc == 0
    # default output dir mirrors the reference: <dir>/visualizations
    pngs = list((pdir / "visualizations").glob("*_rgb.png"))
    assert len(pngs) == 3

    f = tmp_path / "one.nc"
    stack = rng.uniform(0.5, 5, (5, 16, 16)).astype(np.float32)
    stack[0, 0, 0] = np.nan  # NaN must not break the stretch
    write_band_stack(f, GROUP_GEO, stack, mode="w")
    rc = main(["rgb", str(f), "--output-dir", str(tmp_path / "rgbo")])
    assert rc == 0
    assert (tmp_path / "rgbo" / "one_rgb.png").exists()

    kdir = tmp_path / "ak"
    kdir.mkdir()
    np.save(kdir / "kernel_merged.npy", rng.uniform(0, 1, (13, 13)))
    rc = main(["kernels", "--input-dir", str(kdir),
               "--output-dir", str(tmp_path / "ako"), "--annotate"])
    assert rc == 0
    assert (tmp_path / "ako" / "kernel_merged.png").exists()


def test_patch_to_rgb_values(rng):
    from kmsr_tpu.analysis.visualize import patch_to_rgb

    stack = rng.uniform(0, 10, (5, 8, 8)).astype(np.float32)
    rgb = patch_to_rgb(stack)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    # channel order is R=660 (band 3), G=555 (band 2), B=490 (band 1)
    flat = stack[3]
    vmin, vmax = np.percentile(flat, [1, 99])
    expect = np.clip((flat - vmin) / (vmax - vmin), 0, 1)
    np.testing.assert_allclose(rgb[..., 0], expect, atol=1e-6)


@pytest.mark.slow
def test_trainer_trace_flag(tmp_path, rng):
    """--trace DIR captures a jax.profiler device trace around training."""
    from kmsr_tpu.data import synthetic_pool
    from kmsr_tpu.pipeline.train_single_kernel_cli import main as train_main

    pdir = tmp_path / "patches"
    pdir.mkdir()
    pool = synthetic_pool(rng, n=4, size=64, blur_sigma=None)
    from kmsr_tpu.io import GROUP_DENOISED, write_band_stack

    for i in range(4):
        write_band_stack(pdir / f"p{i}.nc", GROUP_DENOISED, pool.patches[i],
                         mode="w")
    trace_dir = tmp_path / "trace"
    rc = train_main([
        "--patch-dir", str(pdir), "--outdir", str(tmp_path / "out"),
        "--iters", "2", "--batch-size", "2", "--lr-crop-size", "8",
        "--log-every", "2", "--kernel-log-every", "2",
        "--trace", str(trace_dir),
    ])
    assert rc == 0
    # jax.profiler writes plugins/profile/<ts>/*.trace.json.gz under the dir
    traced = list(trace_dir.rglob("*"))
    assert any(p.is_file() for p in traced), "no trace files written"
