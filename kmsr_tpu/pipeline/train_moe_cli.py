"""Stage: MoE kernel-bank training (CLI).

Defaults mirror `muti_kernel/train_gemini.py:145-161`.

Usage:
    python -m kmsr_tpu.pipeline.train_moe_cli --patch-dir DIR --outdir OUT \
        [--format npy|nc] [--iters 5000] [--n-kernels 10]
"""
from __future__ import annotations

import argparse

from ..data.sampler import PatchPool
from ..io.schema import GROUP_DENOISED
from ..models.moe import MoEConfig
from ..train.moe import MoETrainConfig, train_moe


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Train MoE kernel bank")
    p.add_argument("--patch-dir", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--format", choices=["npy", "nc"], default="npy")
    p.add_argument("--group", default=GROUP_DENOISED)
    p.add_argument("--iters", type=int, default=5000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n-kernels", type=int, default=10)
    p.add_argument("--kernel-size", type=int, default=13)
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--temp-start", type=float, default=5.0)
    p.add_argument("--temp-end", type=float, default=0.5)
    p.add_argument("--lr-crop-size", type=int, default=None,
                   help="real-LR crop size (default: patch size / factor; "
                        "accepted for orchestrator flag uniformity)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K>1 fuses K steps into one on-device lax.scan dispatch")
    p.add_argument("--ckpt-every", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest orbax checkpoint in outdir/ckpt")
    p.add_argument(
        "--init-from", default=None,
        help="warm-start selector+banks from a checkpoint: the reference's "
             "torch moe_model.pth or this framework's moe_model.npz",
    )
    p.add_argument("--balance-weight", type=float, default=0.0,
                   help="weight of the Switch-style load-balance aux loss "
                        "(0 = reference behavior: soft Gumbel only, which "
                        "collapses the bank on degradation-homogeneous "
                        "data; see losses.load_balance_loss)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all devices")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run")
    a = p.parse_args(argv)
    if a.format == "npy":
        pool = PatchPool.from_npy_dir(a.patch_dir)
    else:
        pool = PatchPool.from_nc_dir(a.patch_dir, group=a.group)
    hr_size = pool.shape[-1]
    cfg = MoETrainConfig(
        iters=a.iters,
        batch_size=a.batch_size,
        lr_rate=a.lr,
        temp_start=a.temp_start,
        temp_end=a.temp_end,
        lr_crop_size=a.lr_crop_size or hr_size // a.factor,
        model=MoEConfig(
            n_kernels=a.n_kernels, kernel_size=a.kernel_size, factor=a.factor
        ),
        balance_weight=a.balance_weight,
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
        out = train_moe(pool, cfg, init_from=a.init_from, mesh=mesh)
    print(f"saved {len(out['artifacts'])} MoE artifacts -> {a.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
