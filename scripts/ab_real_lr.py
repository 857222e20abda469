"""A/B the real_is_lr D-balance knobs against GT-kernel recovery.

The flagship fleet's D trivially wins against genuine native-LR reals
(D ~2e-4, G pinned at 0.5) even with measured fake-side noise, and the
kernels drift AWAY from the GT PSF (run log, NOTES_r5). This script
trains short 2-scene fleets on the ACTUAL pipeline data under candidate
fixes and scores each variant by mean L2(learned kernel, GT):

    variants: baseline / +fake-noise / +border-crop / +d-lr /
              combinations

Usage (after the quality_x8_real_lr pipeline has produced its workdir):
    python scripts/ab_real_lr.py [--iters 2000] [--scenes 2]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--work", default="quality_run/work_real_lr")
    p.add_argument("--gt", default="quality_run/scenes_lr/gt_kernel.npy")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--outdir", default="/tmp/ab_real_lr")
    p.add_argument("--only", default=None,
                   help="comma-separated variant tags to run")
    a = p.parse_args()

    from kmsr_tpu.data.patches import group_by_scene
    from kmsr_tpu.data.sampler import PatchPool, list_patch_files
    from kmsr_tpu.models.discriminator import DiscriminatorConfig
    from kmsr_tpu.models.generator import GeneratorConfig
    from kmsr_tpu.ops.sigma import estimate_sigma_np
    from kmsr_tpu.train.fleet import train_fleet
    from kmsr_tpu.train.single_kernel import SingleKernelConfig

    hr_groups = group_by_scene(
        list_patch_files(os.path.join(a.work, "denoised"), "*.nc",
                         host_shard=False))
    lr_groups = group_by_scene(
        list_patch_files(os.path.join(a.work, "patches_lr"), "*.nc",
                         host_shard=False))
    names = sorted(hr_groups)[: a.scenes]
    pools = [PatchPool.from_files(hr_groups[n], group="denoised")
             for n in names]
    lr_pools = [
        PatchPool.from_files(lr_groups[n], group="geophysical_data")
        for n in names
    ]
    gt = np.load(a.gt)

    pats = np.asarray(lr_pools[0].patches[:64])
    sig = tuple(
        np.median([estimate_sigma_np(pp[b]) for pp in pats])
        for b in range(5)
    )
    print("estimated LR sigma:", [round(s, 3) for s in sig])

    # diagnostic pools: (a) synthetic INTERNAL twin — LR made by
    # degrading each scene's own HR pool with the GT kernel + LR noise
    # (distribution-matched by construction: if D still wins here, the
    # cue is structural, not domain shift); (b) raw (un-denoised) HR
    # input (if that balances D, the cue is NLM texture)
    import jax

    from kmsr_tpu.ops.degrade import degrade

    rng_np = np.random.default_rng(7)
    synth_lr_pools = []
    for pool in pools:
        hr = np.asarray(pool.patches)
        lrs = []
        for i in range(hr.shape[0]):
            d = np.asarray(degrade(jax.numpy.asarray(hr[i]),
                                   jax.numpy.asarray(gt), factor=8))
            d = d + rng_np.normal(0, 1, d.shape) * np.asarray(
                sig)[:, None, None]
            lrs.append(d.astype(np.float32))
        synth_lr_pools.append(PatchPool(np.stack(lrs)))
    raw_groups = group_by_scene(
        list_patch_files(os.path.join(a.work, "patches"), "*.nc",
                         host_shard=False))
    raw_pools = [
        PatchPool.from_files(raw_groups[n], group="geophysical_data")
        for n in names
    ]

    variants = {
        "baseline": {},
        "noise": {"fake_noise_sigma": sig},
        "crop2": {"d_border_crop": 2},
        "noise+crop2": {"fake_noise_sigma": sig, "d_border_crop": 2},
        "noise+crop2+dlr": {"fake_noise_sigma": sig, "d_border_crop": 2,
                            "d_lr_rate": 4e-5},
        "noise+dlr": {"fake_noise_sigma": sig, "d_lr_rate": 4e-5},
        "synth-internal": {"fake_noise_sigma": sig, "_lr": synth_lr_pools},
        "rawhr+noise": {"fake_noise_sigma": sig, "_hr": raw_pools},
    }

    # residual-based sigma: the reference's noise-pool construction
    # (original - NLM-denoised, D_build_noise_pool.py) applied at LR
    # scale — wavelet-MAD over-reads sigma where mesoscale structure
    # reaches the LR Nyquist (band 0: 0.66 vs true 0.55), and the D
    # detects the resulting variance mismatch on the fake side
    from kmsr_tpu.ops.nlm import denoise_batch

    den, _ = denoise_batch(pats, h_factor=1.8)
    resid = pats - den
    sig_resid = tuple(
        float(np.median(resid[:, b].std(axis=(1, 2))))
        for b in range(resid.shape[1])
    )
    print("residual (noise-pool) LR sigma:",
          [round(s, 3) for s in sig_resid])
    variants["noise-resid"] = {"fake_noise_sigma": sig_resid}
    variants["noise-resid+crop2"] = {"fake_noise_sigma": sig_resid,
                                     "d_border_crop": 2}
    # learnable sigma (the reference NoiseEstimator mechanism): MAD init,
    # adversarial gradient self-calibrates against the real noise floor
    variants["noise-learn"] = {"fake_noise_sigma": sig,
                               "fake_noise_learnable": True}
    variants["noise-learn+crop2"] = {"fake_noise_sigma": sig,
                                     "fake_noise_learnable": True,
                                     "d_border_crop": 2}
    # oracle diagnostics (synthetic GT knowledge, never a production
    # mode): exact true sigma isolates whether noise mismatch is the
    # D's remaining cue
    variants["noise-true"] = {
        "fake_noise_sigma": (0.55, 0.72, 0.83, 0.63, 0.19)}
    variants["noise-true+crop2"] = {
        "fake_noise_sigma": (0.55, 0.72, 0.83, 0.63, 0.19),
        "d_border_crop": 2}
    if a.only:
        keep = set(a.only.split(","))
        variants = {t: v for t, v in variants.items() if t in keep}
    results = {}
    for tag, kw in variants.items():
        kw = dict(kw)
        use_pools = kw.pop("_hr", pools)
        use_lr = kw.pop("_lr", lr_pools)
        cfg = SingleKernelConfig(
            iters=a.iters, batch_size=16, lr_crop_size=32,
            real_is_lr=True, steps_per_call=a.k,
            log_every=a.k * 5, kernel_log_every=a.iters,
            outdir=os.path.join(a.outdir, tag), seed=0, verbose=False,
            generator=GeneratorConfig(forward_mode="compose"),
            discriminator=DiscriminatorConfig(),
            **kw,
        )
        out = train_fleet(use_pools, cfg, scene_names=names, progress=False,
                          lr_pools=use_lr)
        k = np.asarray(out["kernel_per_band"])
        err = np.linalg.norm(
            (k - gt[None]).reshape(len(names), gt.shape[0], -1), axis=2
        ).mean(axis=1)
        with open(out["log_files"][0], encoding="utf-8") as f:
            last = f.read().splitlines()[-1].split(",")
        # CSV: iter, loss_D, loss_G_adv, ... (header names in row 0)
        results[tag] = (err.mean(), float(last[1]), float(last[2]))
        print(f"{tag:18s} L2-to-GT {err.mean():.4f} "
              f"(per-scene {[round(e, 4) for e in err]}) "
              f"final D={last[1]} G_adv={last[2]}")
    best = min(results, key=lambda t: results[t][0])
    print(f"best: {best} ({results[best][0]:.4f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
