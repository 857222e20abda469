"""Fleet-trainer benchmark: simultaneous per-scene KernelGAN throughput.

The reference trains one KernelGAN per scene, serially
(`single_kernel/train.py` re-run per scene); one scene's GAN (~1M
params, batch 16 of 256^2 patches) underfills a TPU chip. The fleet
trainer (`train.fleet`) vmaps the SAME combined D+G step over a stacked
scene axis, so one dispatch advances every scene one iteration.

This bench measures steady-state scene-iterations/s for an S-scene
fleet vs the single-scene trainer on the same chip and prints ONE JSON
line (same contract as bench.py):

    {"metric": "fleet_scene_iters_per_s", "value": N,
     "unit": "scene-iters/s", "vs_baseline": N}

where vs_baseline is the speedup of the fleet over running the S
scenes serially (S * single-scene step time / fleet step time).

Env: KMSR_FLEET_SCENES (default 8), KMSR_FLEET_POOL (patches per scene,
default 32), KMSR_FLEET_ITERS (timed dispatches, default 30),
KMSR_FLEET_K (steps_per_call: K>1 fuses K steps per dispatch into one
on-device lax.scan, default 1), KMSR_FLEET_HR / KMSR_FLEET_BATCH
(shrink the reference 256^2 / 16 schedule for smoke runs),
KMSR_FLEET_FWD (generator forward mode, default "compose"),
KMSR_FLEET_CHUNK (scenes per vmapped dispatch chunk via lax.map,
0/unset = all scenes in one vmap).

Forward mode: the fleet defaults to the production "compose" forward
(single depthwise conv with the composed 13x13 kernel — same linear map
as the reference chain away from a 6px border rim, ~230x fewer FLOPs).
The reference-exact "chain" forward stores [B, 5*mid, 256, 256] f32
activations per layer for the G backward; at 8 scenes x batch 16 that
is a measured 21.8 GB fusion — over the 16 GB v5e HBM. Scene chunking
(KMSR_FLEET_CHUNK, auto in `train_fleet`) bounds the residuals by one
chunk, so full-scale chain fleets run on one chip; the chain step is
dense enough that sequential chunks cost little fleet speedup.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _median_step(step, state, args, iters: int, warmup: int = 3):
    import jax

    windows = int(os.environ.get("KMSR_FLEET_WINDOWS", "5"))
    for _ in range(warmup):
        state, metrics = step(state, *args)
    jax.block_until_ready(metrics)
    # scalar readback fences each window (block_until_ready is a no-op
    # on remote tunnel buffers)
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, *args)
        float(np.asarray(metrics["loss_D"]).sum())
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    return (times[len(times) // 2], times[0], times[-1]), state


def run() -> dict:
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.train.fleet import (
        _stack_states,
        make_fleet_chunk_step,
        make_fleet_step,
    )
    from kmsr_tpu.train.single_kernel import (
        SingleKernelConfig,
        init_training,
        make_train_step,
    )

    from kmsr_tpu.models.generator import GeneratorConfig

    s_total = int(os.environ.get("KMSR_FLEET_SCENES", "8"))
    n_pool = int(os.environ.get("KMSR_FLEET_POOL", "32"))
    iters = int(os.environ.get("KMSR_FLEET_ITERS", "30"))
    k_steps = int(os.environ.get("KMSR_FLEET_K", "1"))
    hr = int(os.environ.get("KMSR_FLEET_HR", "256"))
    fwd = os.environ.get("KMSR_FLEET_FWD", "compose")
    cfg = SingleKernelConfig(  # reference schedule: batch 16, 256^2 HR
        hr_patch_size=hr,
        lr_crop_size=hr // 8,
        batch_size=int(os.environ.get("KMSR_FLEET_BATCH", "16")),
        steps_per_call=k_steps,
        generator=GeneratorConfig(forward_mode=fwd),
    )
    rng = np.random.default_rng(0)
    import dataclasses

    # one HBM pool per scene; index batches stay fixed (device-resident)
    # so the timed loop measures pure step compute, like training with
    # steps_per_call>1 does
    pools = jnp.asarray(
        rng.normal(5, 1, (s_total, n_pool, 5, cfg.hr_patch_size,
                          cfg.hr_patch_size)).astype(np.float32)
    )
    hr_idx = jnp.asarray(
        rng.integers(0, n_pool, (s_total, cfg.batch_size)).astype(np.int32)
    )
    crop_idx = jnp.asarray(
        rng.integers(0, n_pool, (s_total, cfg.batch_size)).astype(np.int32)
    )

    # --- single-scene baseline (device-pool step, the production path) --
    single_step = make_train_step(cfg, device_pool=True)
    state1 = init_training(cfg)
    single_args = (
        (pools[0],) if k_steps > 1 else (pools[0], hr_idx[0], crop_idx[0])
    )
    (t_single, _, _), _ = _median_step(single_step, state1, single_args, iters)

    # --- fleet ----------------------------------------------------------
    # KMSR_FLEET_CHUNK=m: m-scene vmapped chunks under lax.map (bounds
    # chain-mode residual HBM; 0/unset = all scenes in one vmap)
    chunk = int(os.environ.get("KMSR_FLEET_CHUNK", "0")) or None
    if k_steps > 1:
        fleet_step = make_fleet_chunk_step(cfg, s_local=s_total,
                                           scene_chunk=chunk)
        fleet_args = (pools, jnp.full((s_total,), n_pool, jnp.int32))
    else:
        fleet_step = make_fleet_step(cfg, s_local=s_total, scene_chunk=chunk)
        fleet_args = (pools, hr_idx, crop_idx)
    state = _stack_states(
        [init_training(dataclasses.replace(cfg, seed=s))
         for s in range(s_total)]
    )
    (t_fleet, t_lo, t_hi), _ = _median_step(fleet_step, state, fleet_args, iters)

    # a dispatch advances every scene k_steps iterations
    scene_iters = s_total * k_steps / t_fleet
    speedup = s_total * t_single / t_fleet
    import sys

    print(
        f"# single-scene dispatch (K={k_steps}, fwd={fwd}):"
        f" {t_single * 1e3:.2f} ms"
        f" | fleet[{s_total}] dispatch: {t_fleet * 1e3:.2f} ms"
        f" | {scene_iters:.1f} scene-iters/s"
        f" | {speedup:.2f}x vs serial",
        file=sys.stderr, flush=True,
    )
    return {
        "metric": "fleet_scene_iters_per_s",
        "value": round(scene_iters, 2),
        "unit": "scene-iters/s",
        "vs_baseline": round(speedup, 3),
        "spread": {
            "min": round(s_total * k_steps / t_hi, 2),
            "max": round(s_total * k_steps / t_lo, 2),
        },
    }


def main() -> int:
    print(json.dumps(run()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
