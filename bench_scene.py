"""Secondary benchmark: whole-scene degrade throughput (Mpix/s input).

Degrades a full Landsat-scale scene (8192x8192, 5 bands) in one device
pass — 13x13 per-band blur + x8 downsample, row-sharded over all visible
devices with ICI halo exchange (`parallel.spatial.degrade_scene`). On one
chip this measures the fused scene path; on a pod slice the rows scale
across ICI. The reference has no whole-scene path at all (scenes must be
pre-cut to 256^2 patches, `A_00_patch_cutter_universal.py`).

Prints ONE JSON line like bench.py; "vs_baseline" is against the same
pixel rate the headline 50k-patches/s target implies
(50_000 * 64 * 64 px/s = 204.8 Mpix/s).

`run(impl)` is also called by `bench.py` (no args) as part of the
consolidated per-round manifest.
"""
from __future__ import annotations

import json
import sys

import numpy as np

BASELINE_MPIX_PER_SEC = 50_000 * 64 * 64 / 1e6  # headline target in pixels


def run(impl: str = "fast", side: int = 8192, iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.parallel.spatial import degrade_scene
    from kmsr_tpu.utils.profiling import bench_windows

    rng = np.random.default_rng(0)
    scene = jnp.asarray(rng.normal(5.0, 2.0, (5, side, side)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))

    fn = jax.jit(lambda s, k: degrade_scene(s, k, factor=8, impl=impl))

    t = bench_windows(fn, scene, kernel, iters=iters)
    mpix = side * side / 1e6
    mpix_per_sec = mpix / t["median_s"]
    return {
        "metric": f"scene_degrade_mpix_per_sec[{impl}]",
        "value": round(mpix_per_sec, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_per_sec / BASELINE_MPIX_PER_SEC, 3),
        "spread": {
            "min": round(mpix / t["max_s"], 1),
            "max": round(mpix / t["min_s"], 1),
        },
    }


def main() -> int:
    import os

    print(json.dumps(run(os.environ.get("KMSR_SCENE_IMPL", "fast"))))
    return 0


if __name__ == "__main__":
    sys.exit(main())
