"""Interleaved A/B: raw-slab scene path vs tiles-in-lanes scene path.

Also times the transform candidates from ab_scene_tiles_transform (the
tiles path's pre-pass) so the end-to-end number decomposes.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmsr_tpu.ops.degrade import compose_with_box, normalize_kernel
from kmsr_tpu.ops.degrade_scene_tiles import degrade_scene_tiles
from kmsr_tpu.parallel.spatial import degrade_scene


def main() -> None:
    side = 8192
    iters = 10
    windows = 5
    rng = np.random.default_rng(0)
    scene = jnp.asarray(
        rng.normal(5.0, 2.0, (5, side, side)).astype(np.float32)
    )
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), 8)

    fn_a = jax.jit(lambda s, k: degrade_scene(s, k, factor=8))
    fn_b = jax.jit(lambda s, c: degrade_scene_tiles(s, c, factor=8, wt=64))

    def drain(o):
        return float(jnp.sum(o[..., :4]))

    oa = np.asarray(fn_a(scene, kernel))
    print("compiled A (raw-slab)", flush=True)
    ob = np.asarray(fn_b(scene, comp))
    print("compiled B (tiles)", flush=True)
    print(f"max abs diff: {np.abs(oa - ob).max():.3e}", flush=True)

    res = {"raw_slab": [], "tiles": []}
    for _ in range(windows):
        for name, fn, arg in (("raw_slab", fn_a, kernel),
                              ("tiles", fn_b, comp)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(scene, arg)
            drain(out)
            dt = time.perf_counter() - t0
            res[name].append(side * side * iters / dt / 1e9)
    for name, v in res.items():
        v = sorted(v)
        print(f"{name}: median {v[len(v)//2]:.3f} Gpix/s "
              f"(min {v[0]:.2f} max {v[-1]:.2f})", flush=True)


if __name__ == "__main__":
    main()
