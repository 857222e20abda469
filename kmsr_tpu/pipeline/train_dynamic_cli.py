"""Stage: dynamic degradation-model training (CLI).

Defaults mirror `muti_kernel/train.py:197-225`.

Usage:
    python -m kmsr_tpu.pipeline.train_dynamic_cli --patch-dir DIR \
        --outdir OUT [--format npy|nc] [--iters 3000] [--batch-size 8] \
        [--bulk-extract]
"""
from __future__ import annotations

import argparse

import jax

from ..data.sampler import PatchPool
from ..io.schema import GROUP_DENOISED
from ..train.dynamic import (
    TARGET_SIGMA,
    DynamicTrainConfig,
    bulk_extract_kernels,
    train_dynamic,
)


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Train dynamic degradation model")
    p.add_argument("--patch-dir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--format", choices=["npy", "nc"], default="npy")
    p.add_argument("--group", default=GROUP_DENOISED)
    p.add_argument("--iters", type=int, default=3000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--noise-reg-weight", type=float, default=20.0)
    p.add_argument("--target-sigma", type=float, nargs=5, default=list(TARGET_SIGMA))
    p.add_argument("--lr-crop-size", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K>1 fuses K steps into one on-device lax.scan dispatch")
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest orbax checkpoint in outdir/ckpt")
    p.add_argument("--bulk-extract", action="store_true",
                   help="after training, extract a per-patch kernel for every file")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run")
    a = p.parse_args(argv)
    if a.format == "npy":
        pool = PatchPool.from_npy_dir(a.patch_dir)
    else:
        pool = PatchPool.from_nc_dir(a.patch_dir, group=a.group)
    cfg = DynamicTrainConfig(
        iters=a.iters,
        batch_size=a.batch_size,
        lr_rate=a.lr,
        noise_reg_weight=a.noise_reg_weight,
        target_sigma=tuple(a.target_sigma),
        lr_crop_size=a.lr_crop_size,
        outdir=a.outdir,
        steps_per_call=a.steps_per_call,
        ckpt_every=a.ckpt_every,
        resume=a.resume,
        seed=a.seed,
    )
    mesh = None
    if a.data_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(axis_names=("data",))
    from .common import maybe_trace

    with maybe_trace(a.trace):
        out = train_dynamic(pool, cfg, mesh=mesh)
    print(f"final kernels: {out['kernel_per_band'].shape} -> {a.outdir}/final_results")
    if a.bulk_extract:
        paths = bulk_extract_kernels(
            jax.device_get(out["state"].g_params), pool,
            f"{a.outdir}/final_results/per_patch", cfg.model,
        )
        print(f"bulk-extracted {len(paths)} per-patch kernels")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
