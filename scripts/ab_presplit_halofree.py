"""Interleaved A/B: natural v3 vs pre-split variants (baked-halo vs
halo-free).

The baked-halo presplit lost to natural v3 on chip (3.93 vs 4.36M,
NOTES_r2): its +25% input bytes at 64^2/f=8 cost more than the three
permutation matmuls it saves. The halo-free layout crosses HBM with
EXACTLY the natural byte count while still skipping the permutation
matmuls and scratch — this A/B decides whether in-kernel replicate-row
reconstruction (one concat per edge dy) keeps that win.

Interleaves all variants in one process (tunnel throughput drifts ~15%
across hours — only same-process interleaved A/Bs are trustworthy,
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
    xn = jax.jit(lambda a: phase_split_chwb(a, 8, halo=False))(x)

    variants = {
        "natural_v3": (
            jax.jit(lambda a, k: degrade_pallas_chwb(a, k, factor=8)), x),
        "presplit_baked": (
            jax.jit(lambda a, k: degrade_pallas_presplit(a, k, factor=8)), xp),
        "halofree": (
            jax.jit(lambda a, k: degrade_pallas_presplit(
                a, k, factor=8, baked_halo=False)), xn),
    }

    def drain(o):
        return float(jnp.sum(o))

    want = None
    for name, (fn, arg) in variants.items():
        out = np.asarray(fn(arg, kernel))
        if want is None:
            want = out
        d = np.abs(out - want).max()
        print(f"compiled {name}: max abs diff vs natural {d:.3e}", flush=True)
        assert d < 1e-4, name

    res = {k: [] for k in variants}
    for _ in range(windows):
        for name, (fn, arg) in variants.items():
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
