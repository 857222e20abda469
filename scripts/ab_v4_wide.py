"""Pending real-chip A/Bs after the bf16-term respell (mantissa masking).

1. Wide-span route (f=4, k=13 -> span 16 > 3f): v4 dense-MXU (now 6
   magnitude-pruned passes for f32 input) vs v2. NOTES_r2 predicted
   ~2-2.5x v2 after the precision fix (was 3.3x with the broken 3-pass
   split); this records the honest number.
2. v4 on bf16-stored input (3 passes) in the same interleave.
3. Headline-route guard (f=8, 64^2): v3 split3 vs highest — confirms the
   masking-based `_bf16_terms` kept the 3-pass win over the 6-pass
   HIGHEST matmul (the headline bench rides split3).

Interleaved same-process windows only (tunnel drift ~15%); one process
pays the first-compile cost once.
"""
from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from kmsr_tpu.ops import degrade_pallas as dp


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
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    c, hw, b = 5, 64, 8192
    x = jnp.asarray(rng.normal(5.0, 2.0, (c, hw, hw, b)).astype(np.float32))
    k13 = jnp.asarray(rng.uniform(0, 1, (c, 13, 13)).astype(np.float32))

    # ---- wide span f=4 (span 16 > 12): v4 vs v2, + v4 bf16 input ----------
    f = 4
    v4 = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f, version=4))
    v2 = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f, version=2))
    xb = x.astype(jnp.bfloat16)
    v4b = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f, version=4))

    t0 = time.perf_counter()
    o4 = v4(x, k13)
    o2 = v2(x, k13)
    o4b = v4b(xb, k13)
    drain(o4), drain(o2), drain(o4b)
    print(f"[wide-span compiles {time.perf_counter()-t0:.1f}s]", flush=True)
    rel = float(jnp.max(jnp.abs(o4 - o2) / (jnp.abs(o2) + 1e-6)))
    relb = float(jnp.max(jnp.abs(o4b.astype(jnp.float32) - o2)
                         / (jnp.abs(o2) + 1e-6)))
    print(f"parity v4-vs-v2 max_rel={rel:.3e}  v4bf16-vs-v2 {relb:.3e}", flush=True)
    assert rel < 1e-4, rel

    r = interleaved(
        {"v4_f32": (v4, (x, k13)), "v2_f32": (v2, (x, k13)),
         "v4_bf16in": (v4b, (xb, k13))},
        iters=30,
    )
    for name, sec in r.items():
        print(f"wide f=4 {name}: {b/sec/1e6:.2f}M patches/s", flush=True)
    print(f"wide-span v4/v2 speedup: {r['v2_f32']/r['v4_f32']:.2f}x", flush=True)

    # ---- headline route f=8: v3 split3 vs highest -------------------------
    f = 8
    s3 = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f,
                                                     perm_mode="split3"))
    hi = jax.jit(lambda a, k: dp.degrade_pallas_chwb(a, k, factor=f,
                                                     perm_mode="highest"))
    t0 = time.perf_counter()
    drain(s3(x, k13)), drain(hi(x, k13))
    print(f"[headline compiles {time.perf_counter()-t0:.1f}s]", flush=True)
    r = interleaved({"v3_split3": (s3, (x, k13)), "v3_highest": (hi, (x, k13))},
                    iters=30)
    for name, sec in r.items():
        print(f"f=8 {name}: {b/sec/1e6:.2f}M patches/s", flush=True)
    print(f"split3/highest speedup: {r['v3_highest']/r['v3_split3']:.2f}x",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
