"""Interleaved A/B: natural-layout v3 vs pre-split tap-lattice kernel.

Interleaves the two variants in one process (tunnel throughput drifts
~15% across hours — only same-process interleaved A/Bs are trustworthy,
NOTES_r2). Prints per-variant median window throughput.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmsr_tpu.ops.degrade_pallas import (
    degrade_pallas_chwb,
    degrade_pallas_presplit,
    phase_split_chwb,
)


def main() -> None:
    batch = 8192
    iters = 30
    windows = 7
    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    x = jnp.asarray(rng.normal(5.0, 2.0, (5, 64, 64, batch)).astype(np.float32))
    xp = jax.jit(lambda a: phase_split_chwb(a, 8))(x)

    fn_a = jax.jit(lambda a, k: degrade_pallas_chwb(a, k, factor=8))
    fn_b = jax.jit(lambda a, k: degrade_pallas_presplit(a, k, factor=8))

    def drain(o):
        return float(jnp.sum(o))

    # host-side parity (avoid an extra combined jit: remote compiles are
    # 200-390s each in a fresh process)
    oa = np.asarray(fn_a(x, kernel))
    print("compiled A", flush=True)
    ob = np.asarray(fn_b(xp, kernel))
    print("compiled B", flush=True)
    print(f"max abs diff: {np.abs(oa - ob).max():.3e}", flush=True)

    res = {"natural_v3": [], "presplit": []}
    for wi in range(windows):
        for name, fn, arg in (("natural_v3", fn_a, x), ("presplit", fn_b, xp)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(arg, kernel)
            drain(out)
            dt = time.perf_counter() - t0
            res[name].append(batch * iters / dt)
    for name, v in res.items():
        v = sorted(v)
        print(f"{name}: median {v[len(v)//2]/1e6:.3f}M patches/s  "
              f"(min {v[0]/1e6:.2f} max {v[-1]/1e6:.2f})")


if __name__ == "__main__":
    main()
