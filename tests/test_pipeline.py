"""End-to-end pipeline slice: cut -> noise pool -> apply kernel ->
make_train_data -> shape gate, all through the stage CLIs' file contracts."""
import numpy as np
import pytest

from kmsr_tpu.data.mask import apply_water_mask
from kmsr_tpu.data.patches import CutConfig, cut_scene, cut_to_files, nan_ratio_gate
from kmsr_tpu.io import (
    GROUP_BLURRED,
    GROUP_DENOISED,
    GROUP_GEO,
    GROUP_HR,
    GROUP_LR,
    NCFile,
    read_band_stack,
    write_band_stack,
)


def make_scene_file(path, rng, h=160, w=160, nir_base=1.0):
    scene = rng.uniform(0.5, 5.0, size=(5, h, w)).astype(np.float32)
    scene[4] = nir_base  # NIR inside water thresholds
    nav = {
        "latitude": np.linspace(30, 31, h * w).reshape(h, w).astype(np.float32),
        "longitude": np.linspace(120, 121, h * w).reshape(h, w).astype(np.float32),
    }
    write_band_stack(path, GROUP_GEO, scene, mode="w")
    with NCFile(path, "a") as f:
        for k, v in nav.items():
            f.create_variable("navigation_data", k, v, dims=("y", "x"))
    return scene


def test_water_mask(rng):
    data = rng.uniform(0.5, 5.0, size=(5, 32, 32)).astype(np.float32)
    data[4, :16] = 100.0   # NIR too bright -> land/cloud
    data[0, 0, 0] = -9999.0
    masked, stats = apply_water_mask(data)
    assert np.isnan(masked[:, :16]).all()
    assert np.isfinite(masked[1:, 16:]).all()
    assert np.isnan(masked[0, 0, 0]) or masked.shape == data.shape
    assert stats.water_pixels == 16 * 32


def test_cut_scene_grid(rng):
    data = rng.normal(size=(5, 96, 96)).astype(np.float32)
    patches, grid_ij, offsets = cut_scene(data, 64, 32)
    assert patches.shape == (4, 5, 64, 64)
    np.testing.assert_array_equal(offsets[-1], [32, 32])
    np.testing.assert_array_equal(patches[0], data[:, :64, :64])
    np.testing.assert_array_equal(patches[-1], data[:, 32:96, 32:96])


def test_nan_gate():
    p = np.zeros((3, 1, 4, 4), np.float32)
    p[1, 0, 0, 0] = np.nan
    keep = nan_ratio_gate(p, 0.0)
    np.testing.assert_array_equal(keep, [True, False, True])
    keep_loose = nan_ratio_gate(p, 0.1)
    np.testing.assert_array_equal(keep_loose, [True, True, True])


def test_full_pipeline_slice(tmp_path, rng):
    # --- stage A: scenes + cut ------------------------------------------
    scenes_dir = tmp_path / "scenes"
    patches_dir = tmp_path / "patches"
    scenes_dir.mkdir()
    make_scene_file(scenes_dir / "sceneA.nc", rng)
    make_scene_file(scenes_dir / "sceneB.nc", rng)

    from kmsr_tpu.pipeline.cut import main as cut_main

    rc = cut_main(
        [
            "--input-dir", str(scenes_dir),
            "--output-dir", str(patches_dir),
            "--patch-size", "64",
            "--stride-ratio", "0.5",
        ]
    )
    assert rc == 0
    patch_files = sorted(patches_dir.glob("*.nc"))
    assert len(patch_files) > 0
    with NCFile(patch_files[0], "r") as f:
        assert f.has_group(GROUP_GEO)
        assert f.has_group("navigation_data")
        attrs = f.get_attrs()
        assert attrs["patch_size"] == 64

    # --- pseudo-denoise: add a 'denoised' group (denoise stage tested
    # separately once the NLM op lands) --------------------------------
    for p in patch_files:
        geo = read_band_stack(p, GROUP_GEO)
        den = geo + rng.normal(0, 0.01, geo.shape).astype(np.float32)
        write_band_stack(p, GROUP_DENOISED, den, mode="a")

    # --- stage D: noise pool --------------------------------------------
    from kmsr_tpu.pipeline.noise_pool_cli import main as pool_main

    pool_file = tmp_path / "pool.npy"
    rc = pool_main(
        [
            "--input-dir", str(patches_dir),
            "--output-file", str(pool_file),
            "--patch-size", "8",
            "--samples-per-file", "2",
        ]
    )
    assert rc == 0
    pool = np.load(pool_file)
    assert pool.shape == (2 * len(patch_files), 5, 8, 8)

    # --- stage C: apply kernel -----------------------------------------
    kernel = rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32)
    kernel_file = tmp_path / "kernel_per_band.npy"
    np.save(kernel_file, kernel)

    from kmsr_tpu.pipeline.apply_kernel import main as apply_main

    blurred_dir = tmp_path / "blurred"
    rc = apply_main(
        [
            "--input-dir", str(patches_dir),
            "--kernel", str(kernel_file),
            "--output-dir", str(blurred_dir),
        ]
    )
    assert rc == 0
    blurred_files = sorted(blurred_dir.glob("*_blurred.nc"))
    assert len(blurred_files) == len(patch_files)
    b = read_band_stack(blurred_files[0], GROUP_BLURRED)
    assert b.shape == (5, 8, 8)
    # original groups preserved by the copy
    assert read_band_stack(blurred_files[0], GROUP_DENOISED).shape == (5, 64, 64)

    # --- validation gate -------------------------------------------------
    from kmsr_tpu.pipeline.check_shapes import main as check_main

    rc = check_main(["--input-dir", str(blurred_dir), "--size", "8"])
    assert rc == 0
    rc_bad = check_main(["--input-dir", str(patches_dir), "--size", "8"])
    assert rc_bad == 1  # patches have no 'blurred' group

    # --- stage E: make train data ----------------------------------------
    from kmsr_tpu.pipeline.make_train_data import main as make_main

    train_dir = tmp_path / "train"
    rc = make_main(
        [
            "--input-dir", str(blurred_dir),
            "--noise-pool", str(pool_file),
            "--output-dir", str(train_dir),
            "--hr-size", "64",
            "--lr-size", "8",
        ]
    )
    assert rc == 0
    train_files = sorted(train_dir.glob("*_train.nc"))
    assert len(train_files) == len(patch_files)
    hr = read_band_stack(train_files[0], GROUP_HR)
    lr = read_band_stack(train_files[0], GROUP_LR)
    assert hr.shape == (5, 64, 64) and lr.shape == (5, 8, 8)

    # lr must equal blurred + a pool entry
    blurred0 = read_band_stack(blurred_files[0], GROUP_BLURRED)
    noise = lr - blurred0
    dists = np.abs(pool - noise[None]).reshape(pool.shape[0], -1).max(axis=1)
    assert dists.min() < 1e-5

    # --- determinism: same seed -> identical lr --------------------------
    train_dir2 = tmp_path / "train2"
    make_main(
        [
            "--input-dir", str(blurred_dir),
            "--noise-pool", str(pool_file),
            "--output-dir", str(train_dir2),
            "--hr-size", "64",
            "--lr-size", "8",
        ]
    )
    lr2 = read_band_stack(sorted(train_dir2.glob("*_train.nc"))[0], GROUP_LR)
    np.testing.assert_array_equal(lr, lr2)


def test_inspect_nc(tmp_path, rng, capsys):
    path = tmp_path / "x.nc"
    make_scene_file(path, rng, h=32, w=32)
    from kmsr_tpu.pipeline.inspect_nc import main as inspect_main

    assert inspect_main([str(path)]) == 0
    out = capsys.readouterr().out
    assert "geophysical_data" in out and "L_TOA_443" in out
    assert inspect_main([str(path), "--list-only"]) == 0
    out = capsys.readouterr().out
    assert "latitude" in out


def test_data_stats_cli(tmp_path, rng, capsys):
    """Per-band stats parity gate (`data_mean_std.py:5-62` counterpart):
    mean/std over a patch dir drive the dynamic model's sigma targets."""
    import json

    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    stacks = rng.normal(3.0, 0.7, size=(4, 5, 16, 16)).astype(np.float32)
    stacks[0, 0, :2, :2] = np.nan
    for i, s in enumerate(stacks):
        np.save(npy_dir / f"p{i}.npy", s)

    from kmsr_tpu.io.schema import BAND_NAMES
    from kmsr_tpu.pipeline.data_stats import main as stats_main

    assert stats_main(["--input-dir", str(npy_dir)]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert set(stats) == set(BAND_NAMES)
    for i, b in enumerate(BAND_NAMES):
        np.testing.assert_allclose(stats[b]["mean"], np.nanmean(stacks[:, i]), rtol=1e-5)
        np.testing.assert_allclose(stats[b]["std"], np.nanstd(stacks[:, i]), rtol=1e-5)

    nc_dir = tmp_path / "nc"
    nc_dir.mkdir()
    for i, s in enumerate(stacks):
        write_band_stack(nc_dir / f"p{i}.nc", GROUP_GEO, s, mode="w")
    assert stats_main(["--input-dir", str(nc_dir), "--format", "nc"]) == 0
    stats_nc = json.loads(capsys.readouterr().out)
    for b in BAND_NAMES:
        np.testing.assert_allclose(stats_nc[b]["mean"], stats[b]["mean"], rtol=1e-4)


def test_enable_persistent_cache(tmp_path, monkeypatch):
    """The CLI compilation cache points jax at a durable dir, honours the
    env overrides, and never raises when disabled or unwritable."""
    import jax

    from kmsr_tpu.utils.cache import enable_persistent_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        cache_dir = tmp_path / "xla"
        monkeypatch.setenv("KMSR_CACHE_DIR", str(cache_dir))
        assert enable_persistent_cache() == str(cache_dir)
        assert cache_dir.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)

        monkeypatch.setenv("KMSR_CACHE", "0")
        assert enable_persistent_cache() is None
        # disabled call must not clobber the configured dir
        assert jax.config.jax_compilation_cache_dir == str(cache_dir)

        monkeypatch.delenv("KMSR_CACHE")
        assert (
            enable_persistent_cache(cache_dir=str(tmp_path / "explicit"))
            == str(tmp_path / "explicit")
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_apply_kernel_mixed_shape_chunks(tmp_path, rng):
    """Files of different sizes sharing one read-chunk must each degrade
    (per-shape groups), not crash the run at np.stack."""
    src = tmp_path / "in"
    src.mkdir()
    for i, hw in enumerate([32, 48, 32]):
        write_band_stack(
            src / f"f{i}.nc", GROUP_GEO,
            rng.normal(3, 0.3, (5, hw, hw)).astype(np.float32), mode="w",
        )
    k = rng.uniform(0, 1, (5, 13, 13)).astype(np.float32)
    kpath = tmp_path / "k.npy"
    np.save(kpath, k / k.sum((1, 2), keepdims=True))

    from kmsr_tpu.pipeline.apply_kernel import main as apply_main

    out = tmp_path / "out"
    rc = apply_main([
        "--input-dir", str(src), "--kernel", str(kpath),
        "--output-dir", str(out), "--factor", "8",
        "--in-group", GROUP_GEO, "--batch-size", "3",
    ])
    assert rc == 0
    from kmsr_tpu.io import read_band_stack as rbs

    shapes = sorted(rbs(p, "blurred").shape for p in sorted(out.glob("*.nc")))
    assert shapes == [(5, 4, 4), (5, 4, 4), (5, 6, 6)]


def test_device_sync_guard_aborts_when_persistent():
    """Per-batch sync-failure isolation must escalate to a run abort
    after N consecutive whole-batch failures (wedged device / programming
    error), instead of grinding through every remaining batch
    (ADVICE r3 low)."""
    import pytest

    from kmsr_tpu.pipeline.common import DeviceSyncGuard

    g = DeviceSyncGuard(max_consecutive=3)
    g.failed(RuntimeError("boom"))
    g.failed(RuntimeError("boom"))
    g.succeeded()  # a success resets the streak
    g.failed(RuntimeError("boom"))
    g.failed(RuntimeError("boom"))
    with pytest.raises(RuntimeError, match="3 consecutive"):
        g.failed(RuntimeError("boom"))


def test_load_kernel_rejects_degenerate(tmp_path):
    """A kernel artifact with an all-zero or NaN band must fail loudly at
    the factory boundary instead of silently degrading that band to pure
    noise in every produced pair (caught live in r5: a collapsed GAN's
    band-2 kernel zeroed the lr side, bilinear 13 dB)."""
    import numpy as np
    import pytest

    from kmsr_tpu.pipeline.apply_kernel import load_kernel

    rng = np.random.default_rng(0)
    k = rng.uniform(0.01, 1.0, (5, 13, 13)).astype(np.float32)
    k /= k.sum(axis=(1, 2), keepdims=True)
    good = tmp_path / "good.npy"
    np.save(good, k)
    assert load_kernel(str(good)).shape == (5, 13, 13)
    k_zero = k.copy()
    k_zero[2] = 0.0
    np.save(tmp_path / "zero.npy", k_zero)
    with pytest.raises(ValueError, match="degenerate kernel"):
        load_kernel(str(tmp_path / "zero.npy"))
    k_nan = k.copy()
    k_nan[0, 0, 0] = np.nan
    np.save(tmp_path / "nan.npy", k_nan)
    with pytest.raises(ValueError, match="degenerate kernel"):
        load_kernel(str(tmp_path / "nan.npy"))


def test_sync_watchdog_simulated_hang():
    """SyncWatchdog (VERDICT r4 item 4): a sync hanging past the
    threshold gets diagnosed each poll; a persistent wedge diagnosis
    triggers on_abort with the history, while a remote-compile diagnosis
    never aborts (the r4 15-min server-side compile must be waited out,
    not killed)."""
    import time as _time

    from kmsr_tpu.pipeline.common import SyncWatchdog

    # -- wedge: injected diagnosis says suspected_wedge every poll ----
    aborts = []
    logs = []
    wd = SyncWatchdog(
        label="t", threshold_s=0.05, poll_s=0.05, wedge_abort_s=0.15,
        diagnose=lambda: ("suspected_wedge", {"host_cpu_util": 0.0}),
        on_abort=aborts.append, log=logs.append,
    )
    with wd:
        with wd.watch():
            for _ in range(60):  # simulated blocked sync
                if aborts:
                    break
                _time.sleep(0.05)
    assert aborts, "persistent wedge never aborted"
    assert aborts[0]["wedge_persist_s"] >= 0.15
    assert any(s == "suspected_wedge" for _, s in aborts[0]["history"])
    assert any("SUSPECTED WEDGE" in m for m in logs)

    # -- remote compile: diagnosed, logged, never aborted -------------
    aborts2, logs2 = [], []
    wd2 = SyncWatchdog(
        label="t2", threshold_s=0.05, poll_s=0.05, wedge_abort_s=0.1,
        diagnose=lambda: ("remote_compile", {"epoll_threads": 1}),
        on_abort=aborts2.append, log=logs2.append,
    )
    with wd2:
        with wd2.watch():
            _time.sleep(0.5)
    assert not aborts2
    assert any("remote compile in progress" in m for m in logs2)
    # -- no sync in progress: monitor stays silent --------------------
    n_logs = len(logs2)
    _time.sleep(0.2)
    assert len(logs2) == n_logs


def test_diagnose_sync_state_real_proc():
    """The /proc-based diagnosis runs on this host and classifies a
    CPU-busy process as host_busy (not a wedge)."""
    import threading

    from kmsr_tpu.pipeline.common import diagnose_sync_state

    stop = threading.Event()

    def burn():
        x = 0
        while not stop.is_set():
            x += 1

    t = threading.Thread(target=burn, daemon=True)
    t.start()
    try:
        state, detail = diagnose_sync_state(cpu_sample_s=0.3)
    finally:
        stop.set()
        t.join()
    assert state in ("host_busy", "remote_compile")
    if state == "host_busy":
        assert detail["host_cpu_util"] >= 0.05
