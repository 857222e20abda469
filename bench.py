"""Headline benchmark: degraded 64x64 training patches / sec / chip.

Measures the fused degrade path (13x13 per-band blur + replicate pad +
x8 downsample, the data-factory hot op) on device-resident batches.
Baseline target: 50,000 patches/s/chip on TPU v5e (BASELINE.md).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


BASELINE_PATCHES_PER_SEC = 50_000.0


def main() -> int:
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # tunnel first-compiles cost 200-390s cold

    batch = 8192
    iters = 50
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))

    use_pallas = jax.default_backend() == "tpu"
    # 'presplit' measures the permutation-free kernel on the loader's
    # pre-phase-split layout (the `factory --input-format npy` production
    # route, where the host assembles the layout for free — the split is
    # therefore outside the timed device work); 'natural' measures the
    # self-contained v3 kernel on raw CHWB batches.
    mode = os.environ.get("KMSR_BENCH_MODE", "natural")
    if use_pallas:
        from kmsr_tpu.ops.degrade_pallas import (
            degrade_pallas_chwb,
            degrade_pallas_presplit,
            phase_split_chwb,
        )

        x = jnp.asarray(
            rng.normal(5.0, 2.0, (5, 64, 64, batch)).astype(np.float32)
        )
        if mode == "presplit":
            # halo-free layout: natural byte count, measured faster than
            # both the baked-halo presplit and natural v3 on chip
            x = jax.jit(lambda a: phase_split_chwb(a, 8, halo=False))(x)
            fn = jax.jit(lambda a, k: degrade_pallas_presplit(
                a, k, factor=8, baked_halo=False))
        else:
            # pad-free fused Mosaic kernel on the factory CHWB layout
            # (batch in lanes) — ~4.8M patches/s on one v5e
            fn = jax.jit(lambda a, k: degrade_pallas_chwb(a, k, factor=8))
        try:
            jnp.sum(fn(x, kernel)).block_until_ready()
        except Exception as e:  # Mosaic unavailable -> still record a number
            print(f"pallas path failed ({type(e).__name__}); "
                  "falling back to XLA", file=sys.stderr)
            use_pallas = False
    if not use_pallas:
        # CPU hosts / Mosaic failure: the XLA strided-conv path
        from kmsr_tpu.ops import degrade_fused

        x = jnp.asarray(
            rng.normal(5.0, 2.0, (batch, 5, 64, 64)).astype(np.float32)
        )
        fn = jax.jit(lambda a, k: degrade_fused(a, k, factor=8))

    def drain(o):
        # Under the remote-tunnel backend, block_until_ready does not
        # round-trip; a scalar readback is the only reliable fence.
        return float(jnp.sum(o))

    drain(fn(x, kernel))  # compile
    for _ in range(3):
        out = fn(x, kernel)
    drain(out)  # warm queue

    # Median of several timing windows: tunnel/host throughput drifts by
    # ~15% across hours and single windows catch transient stalls; the
    # median window is the robust sustained-throughput estimate.
    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x, kernel)
        drain(out)  # device queue is in-order: fences all prior launches
        windows.append(time.perf_counter() - t0)
    dt = sorted(windows)[len(windows) // 2]

    patches_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "degraded_64px_patches_per_sec_per_chip",
                "value": round(patches_per_sec, 1),
                "unit": "patches/s",
                "vs_baseline": round(patches_per_sec / BASELINE_PATCHES_PER_SEC, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
