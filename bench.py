"""Consolidated per-round benchmark manifest (VERDICT r3 item 1).

Prints ONE JSON line. The top-level metric/value/vs_baseline is the
headline (degraded 64x64 patches/s/chip, factor-8 natural-layout median,
target 50,000 — BASELINE.md); `suite` carries every other headline
metric measured IN THE SAME SESSION, so cross-metric comparisons are not
confounded by the tunnel/host session drift (~15%, NOTES_r2):

  suite.scene_fast / scene_bands   whole-scene degrade Gpix/s (raw-slab
                                   stencil + row-band conv fallback)
  suite.sr_progressive / sr_oneshot  SR CNN inference Mpix/s (x8)
  suite.fleet                      simultaneous per-scene KernelGAN
                                   scene-iters/s (+ speedup vs serial)
  suite.nlm                        NLM denoise Mpix/s (batched 2-D)

Each entry is median-of-k windows with min/max spread. Sub-benches are
fault-isolated: a failure records suite.errors[name] and the run
continues; sub-benches not reached inside KMSR_BENCH_BUDGET_S (default
1800 s) are listed in suite.skipped — a nonzero skipped/error count in
BENCH_r{N}.json is the loud signal VERDICT r3 weak-#5 asked for.
KMSR_BENCH_FAST=1 restores the old degrade-only behavior.

Degrade measurement hygiene fields (VERDICT r2 item 4):
  spread          min/max of the k=5 headline timing windows
  modes.natural   self-contained v3 kernel on raw CHWB batches (headline)
  modes.presplit  permutation-free kernel on the loader's pre-phase-split
                  layout (the `factory --input-format npy` production
                  route — the split is host-side, outside the device work)
  modes.factor4   the MoE route's x4 decimation (span 16 > 3*4: extended
                  |q|<=2 tap lattice; `train_gemini.py:134`)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


BASELINE_PATCHES_PER_SEC = 50_000.0
WINDOWS = 5
ITERS = 50


def _measure(fn, x, kernel, batch, drain):
    drain(fn(x, kernel))  # compile
    for _ in range(3):
        out = fn(x, kernel)
    drain(out)  # warm queue
    windows = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(x, kernel)
        drain(out)  # device queue is in-order: fences all prior launches
        windows.append(time.perf_counter() - t0)
    rates = sorted(batch * ITERS / w for w in windows)
    return {
        "median": round(rates[len(rates) // 2], 1),
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
    }


def _bench_degrade(on_tpu: bool) -> dict:
    import jax
    import jax.numpy as jnp

    batch = 8192 if on_tpu else 64
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))

    def drain(o):
        # Under the remote-tunnel backend, block_until_ready does not
        # round-trip; a scalar readback is the only reliable fence.
        return float(jnp.sum(o))

    use_pallas = on_tpu
    modes: dict = {}
    if use_pallas:
        from kmsr_tpu.ops.degrade_pallas import (
            degrade_pallas_chwb,
            degrade_pallas_presplit,
            phase_split_chwb,
        )

        x = jnp.asarray(
            rng.normal(5.0, 2.0, (5, 64, 64, batch)).astype(np.float32)
        )
        try:
            # headline: pad-free fused Mosaic kernel on the factory CHWB
            # layout (batch in lanes)
            nat = jax.jit(lambda a, k: degrade_pallas_chwb(a, k, factor=8))
            modes["natural"] = _measure(nat, x, kernel, batch, drain)
            # halo-free presplit: natural byte count, layout assembled by
            # the native loader for free on the npy factory route
            xs = jax.jit(lambda a: phase_split_chwb(a, 8, halo=False))(x)
            ps = jax.jit(lambda a, k: degrade_pallas_presplit(
                a, k, factor=8, baked_halo=False))
            modes["presplit"] = _measure(ps, xs, kernel, batch, drain)
            # factor-4 (MoE decimation): wide-span extended lattice
            f4 = jax.jit(lambda a, k: degrade_pallas_chwb(
                a, k, factor=4, version=3))
            modes["factor4"] = _measure(f4, x, kernel, batch, drain)
        except Exception as e:  # Mosaic unavailable -> still record a number
            print(f"pallas path failed ({type(e).__name__}: {e}); "
                  "falling back to XLA", file=sys.stderr)
            use_pallas = False
    if not use_pallas:
        # CPU hosts / Mosaic failure: the XLA strided-conv path
        from kmsr_tpu.ops import degrade_fused

        x = jnp.asarray(
            rng.normal(5.0, 2.0, (batch, 5, 64, 64)).astype(np.float32)
        )
        fn = jax.jit(lambda a, k: degrade_fused(a, k, factor=8))
        modes["natural"] = _measure(fn, x, kernel, batch, drain)
    return modes


def _bench_nlm(on_tpu: bool) -> dict:
    """Batched NLM denoise throughput (reference: skimage CPU,
    `denoise/denoise.py:55-63` — patch 7, distance 11)."""
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.ops.nlm import nlm_denoise_2d
    from kmsr_tpu.utils.profiling import bench_windows

    batch, side = (8, 256) if on_tpu else (2, 64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5.0, 0.5, (batch, side, side)).astype(np.float32))
    fn = jax.jit(jax.vmap(
        lambda img: nlm_denoise_2d(img, 0.4, 0.2, patch_size=7,
                                   patch_distance=11)
    ))
    t = bench_windows(fn, x, iters=10 if on_tpu else 2)
    mpix = batch * side * side / 1e6
    return {
        "metric": "nlm_denoise_mpix_per_sec",
        "value": round(mpix / t["median_s"], 2),
        "unit": "Mpix/s",
        "spread": {
            "min": round(mpix / t["max_s"], 2),
            "max": round(mpix / t["min_s"], 2),
        },
    }


def main() -> int:
    import jax

    from kmsr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # tunnel first-compiles cost 200-390s cold

    t_start = time.time()
    budget_s = float(os.environ.get("KMSR_BENCH_BUDGET_S", "1800"))
    on_tpu = jax.default_backend() == "tpu"

    modes = _bench_degrade(on_tpu)
    head = modes["natural"]

    suite: dict = {}
    errors: dict = {}
    skipped: list = []
    if os.environ.get("KMSR_BENCH_FAST") != "1":
        if not on_tpu:
            # scale the suite down for CPU smoke runs
            os.environ.setdefault("KMSR_FLEET_SCENES", "2")
            os.environ.setdefault("KMSR_FLEET_HR", "32")
            os.environ.setdefault("KMSR_FLEET_POOL", "4")
            os.environ.setdefault("KMSR_FLEET_ITERS", "2")
            os.environ.setdefault("KMSR_FLEET_WINDOWS", "2")
        scene_side = 8192 if on_tpu else 512
        sr_batch = 128 if on_tpu else 4
        sr_iters = 30 if on_tpu else 2

        def _sub(name, fn):
            if time.time() - t_start > budget_s:
                skipped.append(name)
                return
            try:
                suite[name] = fn()
            except Exception as e:
                errors[name] = f"{type(e).__name__}: {e}"
                print(f"suite[{name}] failed: {errors[name]}",
                      file=sys.stderr)

        import bench_fleet
        import bench_scene
        import bench_sr

        _sub("scene_fast", lambda: bench_scene.run("fast", side=scene_side))
        _sub("scene_bands", lambda: bench_scene.run("bands", side=scene_side))
        _sub("sr_progressive",
             lambda: bench_sr.bench("progressive", batch=sr_batch,
                                    iters=sr_iters))
        _sub("sr_oneshot",
             lambda: bench_sr.bench("oneshot", batch=sr_batch,
                                    iters=sr_iters))
        _sub("nlm", lambda: _bench_nlm(on_tpu))
        _sub("fleet", bench_fleet.run)

    print(
        json.dumps(
            {
                "metric": "degraded_64px_patches_per_sec_per_chip",
                "value": head["median"],
                "unit": "patches/s",
                "vs_baseline": round(head["median"] / BASELINE_PATCHES_PER_SEC, 3),
                "spread": {"min": head["min"], "max": head["max"]},
                "windows": WINDOWS,
                "iters_per_window": ITERS,
                "modes": modes,
                "suite": suite,
                "suite_errors": errors,
                "suite_skipped": skipped,
                "suite_wall_s": round(time.time() - t_start, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
