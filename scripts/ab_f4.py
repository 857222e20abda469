"""Factor-4 degrade shoot-out (VERDICT r2 item 3).

The MoE variant's production decimation is x4 (`muti_kernel/
train_gemini.py:134`), where the 13-tap blur composes to span 16 > 3*4 —
previously v3 was unavailable and the route fell back to dense-MXU v4
(6-pass: 1.26M patches/s). Candidates measured here on one chip,
interleaved same-process windows (tunnel drift ~15%, NOTES_r2):

  v4_p6      dense MXU, 3-term A x 3-term x, prune i+j<=2 (6 passes)
  v4_p5      dense MXU, 3-term A x 2-term x, prune i+j<=2 (5 passes)
  v4_bt256   v4_p6 at batch_tile 256
  v4_bf16in  bf16-stored input (3 passes, no in-kernel split)
  v3x        extended VPU tap lattice (|q| <= 2 clamped taps) — new
  v3x_bf16in extended lattice on bf16-stored input
  v3x_ps     extended lattice on the HALO-FREE presplit layout (the
             factory npy route; layout built once outside the window)
  v2         phase-split pre-pass baseline

Theoretical ceilings at f=4 (64^2 in, 16^2 out, 5 bands): the dense
256-tap lattice costs 5*65536 fma/patch -> ~3.0M patches/s at the
measured ~1.1e12 fma/s VPU roof; v4's 6 bf16 passes cost 6*5*1.05M
MAC/patch -> ~3.1M at 100% MXU; 3-pass bf16-input v4 -> ~6.3M.

Parity for every candidate is asserted against the XLA replicate-pad
oracle before timing.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmsr_tpu.ops import degrade_pallas as dp
from kmsr_tpu.ops.degrade import degrade_strided


def drain(o):
    return float(jnp.sum(o[..., :1]))


def interleaved(pairs, iters, windows=5):
    res = {k: [] for k in pairs}
    for _ in range(windows):
        for name, (fn, args) in pairs.items():
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            drain(out)
            res[name].append(time.perf_counter() - t0)
    return {k: sorted(v)[len(v) // 2] / iters for k, v in res.items()}


def main() -> int:
    from kmsr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    c, hw, b, f = 5, 64, 8192, 4
    x = jnp.asarray(rng.normal(5.0, 2.0, (c, hw, hw, b)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    k13 = jnp.asarray(rng.uniform(0, 1, (c, 13, 13)).astype(np.float32))

    def chwb(**kw):
        return jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f, **kw))

    xps = jax.jit(
        lambda a: dp.phase_split_chwb(a, factor=f, halo=False)
    )(x)
    xps = jax.block_until_ready(xps)
    v3x_ps = jax.jit(
        lambda a, k: dp.degrade_pallas_presplit(a, k, factor=f, baked_halo=False)
    )

    cands = {
        "v4_p6": (chwb(version=4), (x, k13)),
        "v4_p5": (chwb(version=4, v4_x_terms=2), (x, k13)),
        "v4_bt256": (chwb(version=4, batch_tile=256), (x, k13)),
        "v4_bf16in": (chwb(version=4), (xb, k13)),
        "v3x": (chwb(version=3), (x, k13)),
        "v3x_bt256": (chwb(version=3, batch_tile=256), (x, k13)),
        "v3x_bf16in": (chwb(version=3), (xb, k13)),
        "v3x_ps": (v3x_ps, (xps, k13)),
        "v2": (chwb(version=2), (x, k13)),
    }

    img = jnp.transpose(x, (3, 0, 1, 2))
    want = np.asarray(degrade_strided(img, k13, factor=f))
    t0 = time.perf_counter()
    outs = {name: fn(*args) for name, (fn, args) in cands.items()}
    for o in outs.values():
        drain(o)
    print(f"[compiles {time.perf_counter()-t0:.1f}s]", flush=True)
    scale = float(np.abs(want).mean())
    for name, o in outs.items():
        got = np.transpose(np.asarray(o, np.float32), (3, 0, 1, 2))
        rel = float(np.max(np.abs(got - want)) / scale)
        print(f"parity {name}: max_abs/scale={rel:.3e}", flush=True)
        budget = 2e-3 if "bf16in" in name else 1e-3
        assert rel < budget, (name, rel)

    r = interleaved(cands, iters=30)
    for name, sec in sorted(r.items(), key=lambda kv: kv[1]):
        print(f"f=4 {name}: {b/sec/1e6:.2f}M patches/s", flush=True)

    # f=8 headline guard: the padded-column scratch is unconditional in
    # v3 — confirm the f8 route kept its 4.2-5.3M band (tunnel drift)
    f8 = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=8))
    want8 = np.asarray(degrade_strided(img, k13, factor=8))
    o8 = f8(x, k13)
    drain(o8)
    got8 = np.transpose(np.asarray(o8), (3, 0, 1, 2))
    rel8 = float(np.max(np.abs(got8 - want8)) / np.abs(want8).mean())
    print(f"parity f8 v3 padded-cols: {rel8:.3e}", flush=True)
    assert rel8 < 1e-3, rel8
    r8 = interleaved({"v3_f8_padcols": (f8, (x, k13))}, iters=30)
    print(f"f=8 v3_padcols: {b/r8['v3_f8_padcols']/1e6:.2f}M patches/s",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
