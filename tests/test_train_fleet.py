"""Fleet trainer: vmapped per-scene KernelGAN training.

The fleet must be numerically equivalent to standalone per-scene runs
(same seeds, same host-RNG sampling streams) and indifferent to scene-
axis sharding (per-scene GANs are independent — zero collectives).
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.data.sampler import PatchPool
from kmsr_tpu.models.discriminator import DiscriminatorConfig
from kmsr_tpu.models.generator import GeneratorConfig
from kmsr_tpu.train.fleet import _stack_pools, train_fleet
from kmsr_tpu.train.single_kernel import SingleKernelConfig, train_single_kernel


def tiny_cfg(outdir, iters=4, **kw):
    return SingleKernelConfig(
        iters=iters,
        hr_patch_size=32,
        lr_crop_size=8,
        batch_size=4,
        log_every=2,
        kernel_log_every=2,
        generator=GeneratorConfig(mid_ch=8),
        discriminator=DiscriminatorConfig(base_ch=16, num_blocks=2),
        outdir=str(outdir),
        verbose=False,
        **kw,
    )


def make_pool(rng, n=6, size=32):
    return PatchPool(rng.normal(5, 1, (n, 5, size, size)).astype(np.float32))


def test_stack_pools_cycle_pad(rng):
    p0 = make_pool(rng, n=3)
    p1 = make_pool(rng, n=5)
    stacked, sizes = _stack_pools([p0, p1])
    assert stacked.shape == (2, 5, 5, 32, 32)
    assert sizes == [3, 5]
    np.testing.assert_array_equal(stacked[0, :3], p0.patches)
    np.testing.assert_array_equal(stacked[0, 3], p0.patches[0])
    np.testing.assert_array_equal(stacked[0, 4], p0.patches[1])
    np.testing.assert_array_equal(stacked[1], p1.patches)


@pytest.mark.slow
def test_fleet_matches_standalone_runs(rng, tmp_path):
    """Scene s of the fleet == train_single_kernel at seed base+s (same
    kernels, same CSV losses)."""
    pools = [make_pool(rng, n=6), make_pool(rng, n=9)]

    fleet_out = train_fleet(
        pools, tiny_cfg(tmp_path / "fleet", seed=7),
        scene_names=["a", "b"], progress=False,
    )

    singles = []
    for s, pool in enumerate(pools):
        cfg = tiny_cfg(tmp_path / f"single_{s}", seed=7 + s,
                       device_pool=True)
        singles.append(train_single_kernel(pool, cfg, progress=False))

    for s in range(2):
        np.testing.assert_allclose(
            fleet_out["kernel_per_band"][s],
            singles[s]["kernel_per_band"],
            rtol=1e-5, atol=1e-7,
        )
        with open(fleet_out["log_files"][s], encoding="utf-8") as f:
            fleet_log = f.read().splitlines()
        with open(singles[s]["log_file"], encoding="utf-8") as f:
            single_log = f.read().splitlines()
        assert fleet_log[0] == single_log[0]
        assert len(fleet_log) == len(single_log) == 5  # header + 4 iters
        for lf, ls in zip(fleet_log[1:], single_log[1:]):
            vf = np.array([float(x) for x in lf.split(",")])
            vs = np.array([float(x) for x in ls.split(",")])
            np.testing.assert_allclose(vf, vs, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fleet_artifacts_and_intermediates(rng, tmp_path):
    pools = [make_pool(rng), make_pool(rng)]
    out = train_fleet(
        pools, tiny_cfg(tmp_path / "f"), scene_names=["s0", "s1"],
        progress=False,
    )
    assert out["kernel_per_band"].shape == (2, 5, 13, 13)
    assert out["kernel_merged"].shape == (2, 13, 13)
    for name in ("s0", "s1"):
        d = tmp_path / "f" / name
        for fname in ("training_log.txt", "kernel_per_band.npy",
                      "kernel_merged.npy", "kernel_iter2.npy",
                      "kernel_per_band_iter4.npy"):
            assert (d / fname).exists(), fname
        k = np.load(d / "kernel_per_band.npy")
        assert np.isfinite(k).all()


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical mesh-fleet coverage: dryrun_multichip (every round) + test_dryrun_multichip_8
def test_fleet_scene_sharded_matches_unsharded(rng, tmp_path):
    """Sharding the scene axis over the 8-device mesh reproduces the
    unsharded fleet (independent GANs -> no cross-device math)."""
    from kmsr_tpu.parallel.mesh import make_mesh

    mesh8 = make_mesh(axis_names=("scene",))
    pools = [make_pool(rng, n=4) for _ in range(8)]
    cfg = tiny_cfg(tmp_path / "unsharded", iters=2)
    ref = train_fleet(pools, cfg, progress=False)
    cfg_sh = dataclasses.replace(cfg, outdir=str(tmp_path / "sharded"))
    got = train_fleet(pools, cfg_sh, mesh=mesh8, progress=False)
    np.testing.assert_allclose(
        got["kernel_per_band"], ref["kernel_per_band"], rtol=1e-5, atol=1e-7
    )


def test_fleet_rejects_bad_args(rng, tmp_path):
    pools = [make_pool(rng)]
    with pytest.raises(ValueError):
        train_fleet([], tiny_cfg(tmp_path))
    with pytest.raises(ValueError):  # intervals must be K-multiples
        train_fleet(pools, tiny_cfg(tmp_path, steps_per_call=3))
    with pytest.raises(ValueError):
        train_fleet(pools, tiny_cfg(tmp_path), scene_names=["a", "b"])
    with pytest.raises(ValueError):
        train_fleet(pools + pools, tiny_cfg(tmp_path),
                    scene_names=["a", "a"])
    # real_is_lr argument validation
    with pytest.raises(ValueError, match="needs lr_pools"):
        train_fleet(pools, tiny_cfg(tmp_path, real_is_lr=True))
    with pytest.raises(ValueError, match="lr_pools has"):
        train_fleet(pools + pools, tiny_cfg(tmp_path, real_is_lr=True),
                    scene_names=["a", "b"],
                    lr_pools=[make_pool(rng, size=8)])
    with pytest.raises(ValueError, match="lr_crop_size"):
        train_fleet(pools, tiny_cfg(tmp_path, real_is_lr=True),
                    lr_pools=[make_pool(rng, size=16)])
    with pytest.raises(ValueError, match="real_is_lr is False"):
        train_fleet(pools, tiny_cfg(tmp_path),
                    lr_pools=[make_pool(rng, size=8)])


@pytest.mark.slow
def test_fleet_real_is_lr_matches_standalone(rng, tmp_path):
    """real_is_lr fleet (per-scene native-LR pools as the D's real side)
    == standalone real_is_lr runs at seed base+s: same host-RNG draw
    order (hr indices from the HR pool, crop indices from the LR pool),
    so kernels AND CSV losses are identical (VERDICT r3 item 6; real-side
    contract `single_kernel/train.py:261-268`)."""
    pools = [make_pool(rng, n=6), make_pool(rng, n=9)]
    lr_pools = [make_pool(rng, n=5, size=8), make_pool(rng, n=7, size=8)]

    fleet_out = train_fleet(
        pools, tiny_cfg(tmp_path / "fleet", seed=7, real_is_lr=True),
        scene_names=["a", "b"], progress=False, lr_pools=lr_pools,
    )

    for s, (pool, lrp) in enumerate(zip(pools, lr_pools)):
        cfg = tiny_cfg(tmp_path / f"single_{s}", seed=7 + s,
                       real_is_lr=True)
        single = train_single_kernel(pool, cfg, progress=False,
                                     lr_pool=lrp)
        np.testing.assert_allclose(
            fleet_out["kernel_per_band"][s], single["kernel_per_band"],
            rtol=1e-5, atol=1e-7,
        )
        with open(fleet_out["log_files"][s], encoding="utf-8") as f:
            fleet_log = f.read().splitlines()
        with open(single["log_file"], encoding="utf-8") as f:
            single_log = f.read().splitlines()
        assert len(fleet_log) == len(single_log) == 5  # header + 4 iters
        for lf, ls in zip(fleet_log[1:], single_log[1:]):
            np.testing.assert_allclose(
                [float(x) for x in lf.split(",")],
                [float(x) for x in ls.split(",")],
                rtol=1e-4, atol=1e-6,
            )


@pytest.mark.slow
def test_fleet_real_is_lr_chunked_scene_consistency(rng, tmp_path):
    """K>1 real_is_lr PRODUCTION-path anchor (VERDICT r4 item 3): a
    2-scene fleet must equal two 1-scene fleets run separately at the
    matched seeds (scene s trains at seed base+s), on the SAME
    device-PRNG steps_per_call path — kernels AND CSV losses identical.
    No standalone twin exists for this mode (the standalone trainer's
    lr_pool path samples on host), but per-scene independence is the
    stronger invariant: vmapped scenes must not leak state or RNG into
    each other."""
    # equal per-scene pool SHAPES (different content): the two 1-scene
    # fleets then share one compiled program on a cold cache — the
    # equivalence tested (no cross-scene state/RNG leakage) is the same
    pools = [make_pool(rng, n=4), make_pool(rng, n=4)]
    lr_pools = [make_pool(rng, n=3, size=8), make_pool(rng, n=3, size=8)]

    fleet2 = train_fleet(
        pools,
        tiny_cfg(tmp_path / "f2", seed=11, real_is_lr=True,
                 steps_per_call=2),
        scene_names=["a", "b"], progress=False, lr_pools=lr_pools,
    )
    for s in range(2):
        fleet1 = train_fleet(
            [pools[s]],
            tiny_cfg(tmp_path / f"f1_{s}", seed=11 + s, real_is_lr=True,
                     steps_per_call=2),
            scene_names=["only"], progress=False, lr_pools=[lr_pools[s]],
        )
        np.testing.assert_allclose(
            fleet2["kernel_per_band"][s], fleet1["kernel_per_band"][0],
            rtol=1e-5, atol=1e-7,
        )
        with open(fleet2["log_files"][s], encoding="utf-8") as f:
            log2 = f.read().splitlines()
        with open(fleet1["log_files"][0], encoding="utf-8") as f:
            log1 = f.read().splitlines()
        assert len(log2) == len(log1) > 1
        for l2, l1 in zip(log2[1:], log1[1:]):
            np.testing.assert_allclose(
                [float(x) for x in l2.split(",")],
                [float(x) for x in l1.split(",")],
                rtol=1e-4, atol=1e-6,
            )


@pytest.mark.slow
def test_fleet_fake_noise_sigma(rng, tmp_path):
    """fake_noise_sigma (measured LR-sensor noise on the FAKE side — the
    dynamic variant's NoiseEstimator idea, measured not learned) is
    plumbed through the K>1 fleet path: runs, kernels normalized, and
    the D's loss stream actually differs from the noise-free run (the
    noise changes what the D sees)."""
    pools = [make_pool(rng, n=4)]
    lr_pools = [make_pool(rng, n=3, size=8)]

    outs = {}
    for tag, sig in (("off", None), ("on", (0.5, 0.5, 0.5, 0.5, 0.2))):
        out = train_fleet(
            pools,
            tiny_cfg(tmp_path / tag, seed=3, real_is_lr=True,
                     steps_per_call=2, fake_noise_sigma=sig),
            progress=False, lr_pools=lr_pools,
        )
        k = out["kernel_per_band"]
        assert np.isfinite(k).all()
        np.testing.assert_allclose(k.sum(axis=(-2, -1)), 1.0, atol=1e-5)
        with open(out["log_files"][0], encoding="utf-8") as f:
            outs[tag] = f.read().splitlines()
    assert outs["off"] != outs["on"]


@pytest.mark.slow
def test_fleet_d_balance_knobs(rng, tmp_path):
    """d_border_crop trims both D inputs (shrinking the critic's score
    map) and d_lr_rate unties D's Adam lr — the real_is_lr D-balance
    knobs. Both plumb through the fleet path; crop must reject sizes
    that leave no interior."""
    pools = [make_pool(rng, n=4)]
    lr_pools = [make_pool(rng, n=3, size=8)]
    out = train_fleet(
        pools,
        tiny_cfg(tmp_path / "knobs", real_is_lr=True, steps_per_call=2,
                 d_border_crop=2, d_lr_rate=4e-5,
                 fake_noise_sigma=(0.5,) * 5),
        progress=False, lr_pools=lr_pools,
    )
    k = out["kernel_per_band"]
    assert np.isfinite(k).all()
    np.testing.assert_allclose(k.sum(axis=(-2, -1)), 1.0, atol=1e-5)
    # learnable sigma (NoiseEstimator mechanism): log_sigma rides
    # g_params, gets Adam updates, and MOVES from its init
    out2 = train_fleet(
        [make_pool(rng, n=4)],
        tiny_cfg(tmp_path / "learn", real_is_lr=True, steps_per_call=2,
                 fake_noise_sigma=(0.5,) * 5, fake_noise_learnable=True),
        progress=False, lr_pools=[make_pool(rng, n=3, size=8)],
    )
    ls = np.asarray(out2["state"].g_params["log_sigma"])[0]
    assert ls.shape == (5,) and np.isfinite(ls).all()
    assert not np.allclose(ls, np.log(0.5)), "log_sigma never updated"
    # init without fake_noise_sigma must be rejected
    from kmsr_tpu.train.single_kernel import init_training

    with pytest.raises(ValueError, match="fake_noise_learnable"):
        init_training(tiny_cfg(tmp_path / "bad", fake_noise_learnable=True))


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical: test_fleet_real_is_lr_matches_standalone (real_is_lr) + test_fleet_chunked_matches_standalone_chunked (chunking); default-tier K>1 anchor: test_fleet_real_is_lr_chunked_scene_consistency
def test_fleet_real_is_lr_chunked_runs(rng, tmp_path):
    """K>1 real_is_lr fleet (device-PRNG hr/crop draws from separate
    pool sizes — no standalone twin exists: the standalone trainer's
    lr_pool path samples on host): runs, kernels finite + normalized."""
    pools = [make_pool(rng, n=4), make_pool(rng, n=4)]
    lr_pools = [make_pool(rng, n=3, size=8), make_pool(rng, n=5, size=8)]
    out = train_fleet(
        pools,
        tiny_cfg(tmp_path / "fk", real_is_lr=True, steps_per_call=2),
        progress=False, lr_pools=lr_pools,
    )
    k = out["kernel_per_band"]
    assert k.shape == (2, 5, 13, 13)
    assert np.isfinite(k).all()
    np.testing.assert_allclose(k.sum(axis=(-2, -1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_fleet_chunked_matches_standalone_chunked(rng, tmp_path):
    """steps_per_call=K fleet == standalone steps_per_call=K runs at
    seed base+s: same device-PRNG split order and randint draws inside
    the scan body, so kernels AND the CSV loss stream are identical."""
    pools = [make_pool(rng, n=6), make_pool(rng, n=9)]

    fleet_out = train_fleet(
        pools, tiny_cfg(tmp_path / "fleet", seed=7, steps_per_call=2),
        scene_names=["a", "b"], progress=False,
    )

    for s, pool in enumerate(pools):
        cfg = tiny_cfg(tmp_path / f"single_{s}", seed=7 + s,
                       device_pool=True, steps_per_call=2)
        single = train_single_kernel(pool, cfg, progress=False)
        np.testing.assert_allclose(
            fleet_out["kernel_per_band"][s], single["kernel_per_band"],
            rtol=1e-5, atol=1e-7,
        )
        with open(fleet_out["log_files"][s], encoding="utf-8") as f:
            fleet_log = f.read().splitlines()
        with open(single["log_file"], encoding="utf-8") as f:
            single_log = f.read().splitlines()
        assert len(fleet_log) == len(single_log) == 5  # header + 4 iters
        for lf, ls in zip(fleet_log[1:], single_log[1:]):
            np.testing.assert_allclose(
                [float(x) for x in lf.split(",")],
                [float(x) for x in ls.split(",")],
                rtol=1e-4, atol=1e-6,
            )


@pytest.mark.slow
def test_fleet_resume(rng, tmp_path):
    """ckpt_every + resume continues the whole fleet: the step counter
    carries over and each scene's CSV stays continuous (same contract as
    the single-trainer resume test — the host index stream reseeds at
    the resume point, so bitwise equality with an uninterrupted run is
    not expected)."""
    pools = [make_pool(rng), make_pool(rng)]
    cfg = tiny_cfg(tmp_path / "res", iters=2, ckpt_every=2)
    train_fleet(pools, cfg, progress=False)
    assert (tmp_path / "res" / "ckpt" / "step_2").exists()
    cfg2 = dataclasses.replace(cfg, iters=4, resume=True)
    resumed = train_fleet(pools, cfg2, progress=False)
    assert np.all(np.asarray(resumed["state"].step) == 4)
    assert np.isfinite(resumed["kernel_per_band"]).all()
    for f in resumed["log_files"]:
        lines = open(f, encoding="utf-8").read().splitlines()
        assert lines[0] == "Iteration,Loss_D,Loss_G_adv,Loss_Reg,Loss_Reg_weighted"
        assert [ln.split(",")[0] for ln in lines[1:]] == ["1", "2", "3", "4"]


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical: test_fleet_artifacts_and_intermediates (same run via the library) + test_fleet_rejects_bad_args (argv surface)
def test_fleet_cli(rng, tmp_path):
    from kmsr_tpu.pipeline.train_fleet_cli import main

    root = tmp_path / "scenes"
    for name in ("sceneA", "sceneB"):
        d = root / name
        os.makedirs(d)
        for i in range(3):
            np.save(d / f"p{i}.npy",
                    rng.normal(5, 1, (5, 32, 32)).astype(np.float32))
    out = tmp_path / "out"
    rc = main([
        "--patch-root", str(root), "--outdir", str(out), "--format", "npy",
        "--iters", "2", "--batch-size", "2", "--lr-crop-size", "8",
        "--log-every", "2", "--kernel-log-every", "2",
    ])
    assert rc == 0
    for name in ("sceneA", "sceneB"):
        assert (out / name / "kernel_per_band.npy").exists()


def test_pick_scene_chunk_estimates():
    """Auto chunk: compose fleets always run in one vmap; chain fleets at
    the reference schedule (batch 16, 256^2) are chunked so conv
    residuals (~3.4 GB/scene) fit the ~6 GB budget."""
    from kmsr_tpu.train.fleet import pick_scene_chunk

    ref = SingleKernelConfig(batch_size=16)  # chain mode default
    assert pick_scene_chunk(ref, 8, 256) == 1
    assert pick_scene_chunk(ref, 8, 128) == 4
    compose = dataclasses.replace(
        ref, generator=GeneratorConfig(forward_mode="compose")
    )
    assert pick_scene_chunk(compose, 8, 256) == 8


@pytest.mark.slow
@pytest.mark.exhaustive  # canonical chunk coverage: test_fleet_chunked_matches_standalone_chunked
def test_fleet_scene_chunk_matches_vmap(rng, tmp_path):
    """lax.map scene chunking reproduces the all-scenes-vmap fleet (both
    K=1 host-RNG and K>1 device-PRNG streams). Same draws, same per-scene
    math — but only up to f32 reduction order: XLA schedules convs
    differently per dispatch batch shape (observed: last-ULP CSV loss
    deltas), so logs compare numerically, not as strings."""
    pools = [make_pool(rng, n=4) for _ in range(4)]
    for k in (1, 2):
        cfg = tiny_cfg(tmp_path / f"ref_k{k}", iters=2, steps_per_call=k)
        ref = train_fleet(pools, cfg, progress=False)
        cfg_c = dataclasses.replace(
            cfg, outdir=str(tmp_path / f"chunk_k{k}")
        )
        got = train_fleet(pools, cfg_c, progress=False, scene_chunk=2)
        np.testing.assert_allclose(
            got["kernel_per_band"], ref["kernel_per_band"],
            rtol=1e-5, atol=1e-7,
        )
        for fr, fg in zip(ref["log_files"], got["log_files"]):
            rows_r = np.loadtxt(fr, delimiter=",", skiprows=1)
            rows_g = np.loadtxt(fg, delimiter=",", skiprows=1)
            np.testing.assert_allclose(rows_g, rows_r, rtol=1e-5, atol=1e-7)


def test_fleet_scene_chunk_must_divide(rng, tmp_path):
    pools = [make_pool(rng) for _ in range(3)]
    with pytest.raises(ValueError):
        train_fleet(pools, tiny_cfg(tmp_path), progress=False,
                    scene_chunk=2)
