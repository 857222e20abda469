"""Microbench: candidate scene -> tiles-in-lanes presplit transforms.

Gate for the `degrade_scene_tiles` design: the tiles layout
[C, f(p), out_h, Wt, T] (tiles in lanes, taps lane-aligned) is only
worth building if the transform runs at/near copy speed — NOTES_r2
showed a single multi-dim transpose with minor-dim f can run 4x copy
or OOM, while swap-last-two + mid permutes is copy speed.

Candidates:
  fused1: one 6-D transpose (0,2,1,5,4,3) from
          [C, out_h, f, T, out_wt, f]  (minor f -> T)
  two_stage: proven col_split ([C,f,H,S] at copy speed) then
          [C, q, out_h, f_p, T, out_wt] -> (0,3,2,1,5,4)
  copy:  baseline jnp.copy of the scene (1.34 GB)
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmsr_tpu.ops.degrade_scene_fast import col_split


def fused1(x, factor, wt):
    c, h, w = x.shape
    t, out_h, out_wt = w // wt, h // factor, wt // factor
    xr = x.reshape(c, out_h, factor, t, out_wt, factor)
    return jnp.transpose(xr, (0, 2, 1, 5, 4, 3)).reshape(
        c, factor, out_h, wt, t
    )


def two_stage(x, factor, wt):
    c, h, w = x.shape
    t, out_h, out_wt = w // wt, h // factor, wt // factor
    byq = col_split(x, factor)  # [C, f(q), H, S]
    br = byq.reshape(c, factor, out_h, factor, t, out_wt)
    return jnp.transpose(br, (0, 3, 2, 1, 5, 4)).reshape(
        c, factor, out_h, wt, t
    )


# The production transform itself — benchmark the real code, not a copy
from kmsr_tpu.ops.degrade_scene_tiles import scene_to_tiles_ext as fused_ext


def main() -> None:
    side = 8192
    factor, wt = 8, 64
    iters = 20
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(5, 2, (5, side, side)).astype(np.float32))

    fns = {
        "copy": jax.jit(lambda a: a + 1.0),
        "fused1": jax.jit(lambda a: fused1(a, factor, wt)),
        "two_stage": jax.jit(lambda a: two_stage(a, factor, wt)),
        "fused_ext": jax.jit(lambda a: fused_ext(a, factor, wt)),
        "col_split_only": jax.jit(lambda a: col_split(a, factor)),
    }

    def drain(o):
        return float(jnp.sum(o[..., :1, :1]))

    # correctness: fused1 == two_stage == numpy oracle on a small case
    xs = jnp.asarray(rng.normal(size=(2, 32, 32)).astype(np.float32))
    a = np.asarray(fused1(xs, 4, 16))
    b = np.asarray(two_stage(xs, 4, 16))
    o = np.empty_like(a)
    xn = np.asarray(xs)
    for p in range(4):
        for i in range(8):
            for dxi in range(4):
                for j in range(4):
                    for t in range(2):
                        o[:, p, i, dxi * 4 + j, t] = xn[
                            :, 4 * i + p, 16 * t + 4 * j + dxi
                        ]
    print("fused1 vs oracle:", np.abs(a - o).max(),
          "two_stage vs oracle:", np.abs(b - o).max(), flush=True)
    # fused_ext: [hl | tile | hr] sublane layout vs clamped-column oracle
    e = np.asarray(fused_ext(xs, 4, 16))
    oe = np.empty((2, 4, 8, 16 + 8, 2), np.float32)
    for p in range(4):
        for i in range(8):
            for t in range(2):
                for r in range(4):
                    oe[:, p, i, r, t] = xn[
                        :, 4 * i + p, max(16 * t - 4 + r, 0)
                    ]
                    oe[:, p, i, 4 + 16 + r, t] = xn[
                        :, 4 * i + p, min(16 * (t + 1) + r, 31)
                    ]
                oe[:, p, i, 4 : 4 + 16, t] = o[:, p, i, :, t]
    print("fused_ext vs oracle:", np.abs(e - oe).max(), flush=True)

    for name, fn in fns.items():
        drain(fn(x))  # compile
        res = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(x)
            drain(out)
            res.append((time.perf_counter() - t0) / iters * 1e3)
        res.sort()
        print(f"{name}: median {res[2]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
