"""Secondary benchmark: SR inference throughput (Mpix of output / sec / chip).

The BASELINE north star asks for >= 200 Mpix/s SR inference at x8 on one
chip. `bench.py` (the driver's headline) measures the degrade data-factory
path; this script measures the SR CNN forward for both upsampler variants.

Prints ONE JSON line per variant.
"""
from __future__ import annotations

import json

import numpy as np

BASELINE_MPIX_PER_SEC = 200.0


def bench(upsampler: str, batch: int = 128, iters: int = 30) -> dict:
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.models.sr import SRConfig, init_sr, sr_forward

    cfg = SRConfig(upsampler=upsampler)
    params = init_sr(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(3.0, 1.0, (batch, 5, 32, 32)).astype(np.float32))
    fwd = jax.jit(lambda p, a: sr_forward(p, a, cfg))

    from kmsr_tpu.utils.profiling import bench_windows

    t = bench_windows(fwd, params, x, iters=iters)
    out_mpix = batch * (32 * cfg.factor) ** 2 / 1e6
    mpix = out_mpix / t["median_s"]
    return {
        "metric": f"sr_x8_inference_mpix_per_sec[{upsampler}]",
        "value": round(mpix, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix / BASELINE_MPIX_PER_SEC, 3),
        "spread": {
            "min": round(out_mpix / t["max_s"], 1),
            "max": round(out_mpix / t["min_s"], 1),
        },
    }


def main() -> int:
    for upsampler in ("progressive", "oneshot"):
        print(json.dumps(bench(upsampler)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
