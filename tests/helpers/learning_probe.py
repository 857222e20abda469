"""Subprocess learning probe for the single-kernel KernelGAN.

Run WITHOUT the test suite's CPU pin so it executes on the real
accelerator (the virtual-CPU mesh on the 1-core CI host is ~1000x slower
than a chip — a 400-iteration GAN run is only practical on device).

"Real LR" patches come from a KNOWN wide Gaussian degradation (sigma=4)
of held-out HR; the GAN must move its sigma=2-init kernel toward the true
kernel. Prints ONE JSON line with the learning trajectory stats.

(Blur WIDTH is the statistic identifiable at this scale; orientation is
not — the reference's discriminator batch-norms per-channel magnitudes
away, and we reproduce that architecture.)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> int:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kmsr_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from kmsr_tpu.models import (
        DiscriminatorConfig,
        GeneratorConfig,
        extract_kernels,
        gaussian_kernel,
    )
    from kmsr_tpu.ops import degrade
    from kmsr_tpu.train import SingleKernelConfig, init_training, make_train_step

    rng = np.random.default_rng(0)
    k_true = np.asarray(gaussian_kernel(13, 4.0), np.float32)

    # structured HR: box-smoothed random fields (so blur is identifiable)
    n, size = 32, 64
    base = rng.normal(3, 1, (n, 5, size, size)).astype(np.float32)
    sm = base.reshape(n * 5, size, size)
    pad = np.pad(sm, ((0, 0), (2, 2), (2, 2)), mode="reflect")
    acc = np.zeros_like(sm)
    for dy in range(5):
        for dx in range(5):
            acc += pad[:, dy : dy + size, dx : dx + size]
    hr = (acc.reshape(n, 5, size, size) / 25.0 * 3.0).astype(np.float32)

    lr_real = np.asarray(
        degrade(jnp.asarray(hr[n // 2 :]), jnp.asarray(k_true), factor=8)
    )
    hr_train = hr[: n // 2]

    cfg = SingleKernelConfig(
        iters=400,
        hr_patch_size=size,
        lr_crop_size=8,
        batch_size=8,
        real_is_lr=True,
        generator=GeneratorConfig(mid_ch=8),
        discriminator=DiscriminatorConfig(base_ch=16, num_blocks=2),
        verbose=False,
    )
    step_fn = make_train_step(cfg)
    state = init_training(cfg)
    k_init = np.asarray(extract_kernels(state.g_params)).mean(axis=0)

    # K-step on-device scan over HBM-resident pools: 400 per-iteration
    # dispatches through the device tunnel cost ~1 s RTT each (measured
    # ~475 s probe wall); 8 scan chunks with device-PRNG index sampling
    # run the same schedule in a handful of launches.
    K = 50

    @jax.jit
    def chunk(st, hr_pool, lr_pool):
        def body(s, _):
            rng, k_hr, k_cr = jax.random.split(s.rng, 3)
            hi = jax.random.randint(k_hr, (cfg.batch_size,), 0,
                                    hr_pool.shape[0])
            ri = jax.random.randint(k_cr, (cfg.batch_size,), 0,
                                    lr_pool.shape[0])
            s = dataclasses.replace(s, rng=rng)
            return step_fn(s, jnp.take(hr_pool, hi, axis=0),
                           jnp.take(lr_pool, ri, axis=0))

        return jax.lax.scan(body, st, None, length=K)

    hr_dev, lr_dev = jnp.asarray(hr_train), jnp.asarray(lr_real)
    for _ in range(cfg.iters // K):
        state, metrics = chunk(state, hr_dev, lr_dev)
    metrics = jax.tree_util.tree_map(lambda x: x[-1], metrics)

    ks = np.asarray(metrics["kernels"])
    k_final = ks.mean(axis=0)
    yy, xx = np.meshgrid(np.arange(13) - 6.0, np.arange(13) - 6.0, indexing="ij")
    result = {
        "backend": jax.default_backend(),
        "finite": bool(np.isfinite(ks).all()),
        "kernel_sums": [float(s) for s in ks.sum(axis=(1, 2))],
        "err_init": float(np.linalg.norm(k_init - k_true)),
        "err_final": float(np.linalg.norm(k_final - k_true)),
        "var_init": float((k_init * (xx**2 + yy**2)).sum()),
        "var_final": float((k_final * (xx**2 + yy**2)).sum()),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
