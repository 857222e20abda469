"""One-process measurement session for the round's pending TPU A/Bs.

The tunnel's first compile costs minutes and backend init can be flaky,
so all pending measurements share one process, ordered cheapest-first:

  1. patch kernel: natural-layout v3 vs pre-split (degrade_pallas_presplit)
  2. scene transforms: copy vs col_split vs fused tile transforms
  3. scene end-to-end: raw-slab path vs tiles-in-lanes path

Interleaved windows within each A/B (tunnel throughput drifts ~15%
across hours; only same-process interleaved comparisons are valid).
Prints one labeled line per result; exits nonzero on parity failure.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp


def drain(o):
    return float(jnp.sum(o[..., :1]))


def timed(fn, *args, iters, windows=5):
    res = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        drain(out)
        res.append(time.perf_counter() - t0)
    return sorted(res)[len(res) // 2] / iters


def interleaved(pairs, iters, windows=5):
    """pairs: {name: (fn, args)}. Returns {name: median_sec_per_iter}."""
    res = {k: [] for k in pairs}
    for _ in range(windows):
        for name, (fn, args) in pairs.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            drain(out)
            res[name].append(time.perf_counter() - t0)
    return {k: sorted(v)[len(v) // 2] / iters for k, v in res.items()}


def patch_ab() -> None:
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_chwb,
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    batch = 8192
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    x = jnp.asarray(
        rng.normal(5.0, 2.0, (5, 64, 64, batch)).astype(np.float32)
    )
    xp = jax.jit(lambda a: phase_split_chwb(a, 8))(x)
    fn_a = jax.jit(lambda a, k: degrade_pallas_chwb(a, k, factor=8))
    fn_b = jax.jit(lambda a, k: degrade_pallas_presplit(a, k, factor=8))
    oa = np.asarray(fn_a(x, kernel))
    print("patch: compiled A", flush=True)
    ob = np.asarray(fn_b(xp, kernel))
    print("patch: compiled B", flush=True)
    d = np.abs(oa - ob).max()
    print(f"patch: max abs diff {d:.3e}", flush=True)
    assert d == 0.0, "presplit parity"
    r = interleaved(
        {"natural_v3": (fn_a, (x, kernel)), "presplit": (fn_b, (xp, kernel))},
        iters=30,
    )
    for name, sec in r.items():
        print(f"patch {name}: {batch / sec / 1e6:.3f}M patches/s", flush=True)


def scene_transform_ab() -> None:
    from kmsr_tpu.ops.degrade_scene_fast import col_split
    from kmsr_tpu.ops.degrade_scene_tiles import scene_to_tiles_ext

    side = 8192
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5, 2, (5, side, side)).astype(np.float32))
    fns = {
        "copy": jax.jit(lambda a: a + 1.0),
        "col_split": jax.jit(lambda a: col_split(a, 8)),
        "tiles_ext": jax.jit(lambda a: scene_to_tiles_ext(a, 8, 64)),
    }
    for name, fn in fns.items():
        drain(fn(x))
        print(f"transform {name}: {timed(fn, x, iters=20) * 1e3:.2f} ms",
              flush=True)


def scene_ab() -> None:
    from kmsr_tpu.ops.degrade import compose_with_box, normalize_kernel
    from kmsr_tpu.ops.degrade_scene_tiles import degrade_scene_tiles
    from kmsr_tpu.parallel.spatial import degrade_scene

    side = 8192
    rng = np.random.default_rng(0)
    scene = jnp.asarray(
        rng.normal(5.0, 2.0, (5, side, side)).astype(np.float32)
    )
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), 8)
    fn_a = jax.jit(lambda s, k: degrade_scene(s, k, factor=8))
    fn_b = jax.jit(lambda s, c: degrade_scene_tiles(s, c, factor=8, wt=64))
    oa = np.asarray(fn_a(scene, kernel))
    print("scene: compiled A (raw-slab)", flush=True)
    ob = np.asarray(fn_b(scene, comp))
    print("scene: compiled B (tiles)", flush=True)
    d = np.abs(oa - ob).max()
    print(f"scene: max abs diff {d:.3e}", flush=True)
    assert d < 1e-3, "tiles parity"
    r = interleaved(
        {"raw_slab": (fn_a, (scene, kernel)), "tiles": (fn_b, (scene, comp))},
        iters=10,
    )
    for name, sec in r.items():
        print(f"scene {name}: {side * side / sec / 1e9:.3f} Gpix/s",
              flush=True)


def main() -> None:
    t0 = time.time()
    patch_ab()
    print(f"[{time.time() - t0:.0f}s]", flush=True)
    scene_transform_ab()
    print(f"[{time.time() - t0:.0f}s]", flush=True)
    scene_ab()
    print(f"[{time.time() - t0:.0f}s] all done", flush=True)


if __name__ == "__main__":
    main()
