"""Stage: fleet KernelGAN training — all scenes' kernels in one run (CLI).

The reference runs `single_kernel/train.py` once per scene, serially;
this stage vmaps the same training step over every scene at once (see
`train.fleet`) and writes the standard per-scene artifact set
(`training_log.txt`, kernel .npy dumps) under OUTDIR/<scene>/.

Usage:
    # one subdirectory of patches per scene
    python -m kmsr_tpu.pipeline.train_fleet_cli \
        --patch-root PATCHES_ROOT --outdir OUT [--iters 10000] ...

    # or explicit per-scene dirs
    python -m kmsr_tpu.pipeline.train_fleet_cli \
        --patch-dirs sceneA/ sceneB/ sceneC/ --outdir OUT \
        [--scene-parallel]  # shard the scene axis over all devices
"""
from __future__ import annotations

import argparse
import os

from ..data.sampler import PatchPool
from ..io.schema import GROUP_DENOISED
from ..models.generator import GeneratorConfig
from ..train.fleet import train_fleet
from ..train.single_kernel import SingleKernelConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train one KernelGAN per scene, all simultaneously"
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--patch-root",
                     help="directory with one patch subdirectory per scene")
    src.add_argument("--patch-dirs", nargs="+",
                     help="explicit per-scene patch directories")
    src.add_argument("--patch-dir",
                     help="ONE flat patch directory (cutter/denoise output); "
                          "files regroup into scenes by name prefix")
    p.add_argument("--outdir", required=True)
    p.add_argument("--group", default=GROUP_DENOISED)
    p.add_argument("--format", choices=("nc", "npy"), default="nc",
                   help="patch file format inside each scene dir")
    p.add_argument("--iters", type=int, default=10_000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr-crop-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--reg-weight", type=float, default=0.002)
    p.add_argument("--grad-clip", type=float, default=20.0)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--kernel-log-every", type=int, default=100)
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume the whole fleet from OUTDIR/ckpt")
    p.add_argument("--seed", type=int, default=0,
                   help="scene s trains with seed SEED+s")
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K>1: fuse K steps per dispatch into one on-device "
                        "lax.scan (per-scene device-PRNG sampling; logging/"
                        "ckpt intervals must be K-multiples)")
    p.add_argument("--fast-forward", action="store_true",
                   help="run G as ONE composed depthwise conv")
    p.add_argument("--differentiable-reg", action="store_true")
    p.add_argument("--scene-parallel", action="store_true",
                   help="shard the scene axis over all local devices "
                        "(zero collectives; scenes must divide devices)")
    p.add_argument("--scene-chunk", type=int, default=0,
                   help="scenes per vmapped dispatch chunk (bounds chain-"
                        "mode activation HBM; must divide the per-device "
                        "scene count; 0 = auto by residual estimate)")
    p.add_argument("--real-is-lr", action="store_true",
                   help="the D's real side is GENUINE native-LR patches "
                        "(per-scene pools from --real-lr-dir) instead of "
                        "crops of the HR patches — the scientifically "
                        "right real side for the cross-sensor task "
                        "(standalone contract single_kernel/train.py:261-268)")
    p.add_argument("--real-lr-dir", default=None,
                   help="flat directory of native-LR patch .nc files at "
                        "lr-crop-size (cut from the LR sensor's scenes); "
                        "files regroup into scenes by name prefix, which "
                        "must cover every HR scene")
    p.add_argument("--real-lr-group", default="geophysical_data",
                   help="NetCDF group of the native-LR patches (raw "
                        "sensor radiance, not denoised)")
    p.add_argument("--raw-sum-reg", type=float, default=0.0,
                   help="weight of the un-clamped composed-kernel "
                        "band-sum-to-1 penalty (prevents all-negative "
                        "band collapse under a dominated D; 0 = "
                        "reference behavior)")
    p.add_argument("--d-border-crop", type=int, default=0,
                   help="crop N px off every side of both D inputs — "
                        "removes the fake side's reflect-padding rim "
                        "shortcut in real_is_lr mode (0 = reference "
                        "behavior)")
    p.add_argument("--d-lr", type=float, default=None,
                   help="D's Adam lr (default: tied to --lr, reference "
                        "behavior); lower it when D saturates against a "
                        "distribution-shifted native-LR real side")
    p.add_argument("--fake-noise", default="off",
                   help="'off' (reference behavior), 'learn' (sigma is a "
                        "LEARNABLE per-band parameter initialized from "
                        "the wavelet-MAD estimate — the NoiseEstimator "
                        "mechanism, self-calibrating), 'auto' (estimate "
                        "per-band sigma from the native-LR pool with the "
                        "denoise stage's wavelet-MAD estimator and add "
                        "N(0,sigma) to the FAKE side so the D cannot win "
                        "on noise texture alone — the dynamic variant's "
                        "NoiseEstimator idea, measured instead of "
                        "learned), or 5 comma-separated sigmas")
    return p


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    a = build_parser().parse_args(argv)
    import jax

    if jax.process_count() > 1:
        # every scene needs its FULL pool on every process; the stages'
        # default host-sharded file lists would give each host a partial,
        # host-different subset and race the per-scene artifact writes
        raise SystemExit(
            "train_fleet_cli does not support multi-process launches; "
            "run one process and use --scene-parallel to spread scenes "
            "over this host's devices"
        )
    if a.patch_dir:
        from ..data.patches import group_by_scene
        from ..data.sampler import list_patch_files

        pattern = "*.npy" if a.format == "npy" else "*.nc"
        groups = group_by_scene(
            list_patch_files(a.patch_dir, pattern, host_shard=False)
        )
        names = list(groups)
        pools = [
            PatchPool.from_files(fs, group=a.group) for fs in groups.values()
        ]
    else:
        if a.patch_root:
            dirs = sorted(
                os.path.join(a.patch_root, d)
                for d in os.listdir(a.patch_root)
                if os.path.isdir(os.path.join(a.patch_root, d))
            )
            if not dirs:
                raise SystemExit(f"no scene subdirectories in {a.patch_root}")
        else:
            dirs = a.patch_dirs
        names = [os.path.basename(os.path.normpath(d)) for d in dirs]
        if a.format == "npy":
            pools = [PatchPool.from_npy_dir(d) for d in dirs]
        else:
            pools = [PatchPool.from_nc_dir(d, group=a.group) for d in dirs]
    lr_pools = None
    if a.real_is_lr:
        if not a.real_lr_dir:
            raise SystemExit("--real-is-lr needs --real-lr-dir")
        from ..data.patches import group_by_scene
        from ..data.sampler import list_patch_files

        lr_groups = group_by_scene(
            list_patch_files(a.real_lr_dir, "*.nc", host_shard=False)
        )
        missing = [n for n in names if n not in lr_groups]
        if missing:
            raise SystemExit(
                f"--real-lr-dir {a.real_lr_dir} has no patches for "
                f"scenes {missing} (found: {sorted(lr_groups)})"
            )
        lr_pools = [
            PatchPool.from_files(lr_groups[n], group=a.real_lr_group)
            for n in names
        ]
    elif a.real_lr_dir:
        raise SystemExit("--real-lr-dir given without --real-is-lr")
    fake_noise_sigma = None
    fake_noise_learnable = False
    if a.fake_noise in ("auto", "learn"):
        if lr_pools is None:
            raise SystemExit("--fake-noise auto needs --real-is-lr "
                             "(sigma is estimated from the LR pool)")
        import numpy as np

        from ..ops.sigma import estimate_sigma_np

        sigs = []
        for pool in lr_pools:
            pats = np.asarray(pool.patches[:64])  # [N, C, h, w]
            sigs.append([
                np.median([estimate_sigma_np(p[b]) for p in pats])
                for b in range(pats.shape[1])
            ])
        fake_noise_sigma = tuple(np.median(np.asarray(sigs), axis=0))
        fake_noise_learnable = a.fake_noise == "learn"
        print("fleet: fake-side noise sigma (wavelet-MAD of the LR "
              "pools): " + ", ".join(f"{s:.3f}" for s in fake_noise_sigma)
              + (" [learnable init]" if fake_noise_learnable else ""))
    elif a.fake_noise != "off":
        fake_noise_sigma = tuple(float(x) for x in a.fake_noise.split(","))
    cfg = SingleKernelConfig(
        iters=a.iters,
        batch_size=a.batch_size,
        lr_crop_size=a.lr_crop_size,
        real_is_lr=a.real_is_lr,
        fake_noise_sigma=fake_noise_sigma,
        fake_noise_learnable=fake_noise_learnable,
        raw_sum_reg=a.raw_sum_reg,
        d_border_crop=a.d_border_crop,
        d_lr_rate=a.d_lr,
        lr_rate=a.lr,
        reg_weight=a.reg_weight,
        grad_clip_norm=a.grad_clip,
        log_every=a.log_every,
        kernel_log_every=a.kernel_log_every,
        ckpt_every=a.ckpt_every,
        resume=a.resume,
        outdir=a.outdir,
        seed=a.seed,
        steps_per_call=a.steps_per_call,
        differentiable_reg=a.differentiable_reg,
        generator=GeneratorConfig(
            forward_mode="compose" if a.fast_forward else "chain"
        ),
    )
    mesh = None
    if a.scene_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(axis_names=("scene",))
    out = train_fleet(pools, cfg, scene_names=names, mesh=mesh,
                      scene_chunk=a.scene_chunk or None, lr_pools=lr_pools)
    print(f"fleet done: {len(out['scene_names'])} scenes -> {a.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
