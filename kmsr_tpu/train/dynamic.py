"""Dynamic (content-conditioned) degradation-model training.

Schedule parity with `muti_kernel/train.py:191-334`: 3000 iters, batch 8,
Adam 1e-4 for both G (generator + noise estimator) and D, LSGAN, 4-term
kernel regularizer (no CenterMax) on the batch-mean extracted kernels
(non-differentiable — reference quirk), noise regularizer weight 20 with
per-band radiance targets sigma = [0.55, 0.72, 0.83, 0.63, 0.19];
ASCII-kernel files under visuals/, `batch_kernels_iter*.npy` dumps, final
`final_results/kernel_per_band.npy` + `kernel_merged.npy`; plus
`bulk_extract_kernels` over a patch folder (`muti_kernel/train.py:118-188`).

As with the single-kernel loop, the combined D+G step is one jitted
function with the batch sharded over the mesh's 'data' axis.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..analysis.kernel_metrics import ascii_kernel, kernel_metrics
from ..data.sampler import PatchPool
from ..losses import (
    lsgan_d_loss,
    lsgan_g_loss,
    noise_reg_loss,
    per_band_kernel_regularization,
)
from ..models.discriminator import (
    DiscriminatorConfig,
    discriminator_forward,
    init_discriminator,
)
from ..models.dynamic import (
    DynamicConfig,
    degradation_model_forward,
    extract_dynamic_kernels,
    init_degradation_model,
)
from .single_kernel import random_crops
from .state import (
    GANTrainState,
    check_mesh_vs_scan,
    check_scan_intervals,
    init_gan_state,
    make_gan_optimizers,
    maybe_resume,
    make_chunk_step,
)

TARGET_SIGMA = (0.55, 0.72, 0.83, 0.63, 0.19)


@dataclasses.dataclass
class DynamicTrainConfig:
    iters: int = 3000
    batch_size: int = 8
    hr_patch_size: int = 256
    lr_crop_size: int = 32
    lr_rate: float = 1e-4
    noise_reg_weight: float = 20.0
    target_sigma: tuple = TARGET_SIGMA
    reg_weights: dict = dataclasses.field(
        default_factory=lambda: dict(alpha=0.5, beta=0.5, gamma=5.0, delta=1.0)
    )
    model: DynamicConfig = dataclasses.field(
        default_factory=lambda: DynamicConfig(noise_init=0.3, noise_max=1.2)
    )
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    log_every: int = 100
    kernel_log_every: int = 100
    outdir: str = "output/dynamic_kernel"
    device_pool: Optional[bool] = None  # HBM-resident pool with on-device
    #   batch gathers (see train.single_kernel); auto for pools <= 4 GB
    steps_per_call: int = 1  # >1: K steps per dispatch as one on-device
    #   lax.scan with device-PRNG index sampling (requires device_pool;
    #   iters and *_every intervals must be multiples of K)
    ckpt_every: int = 0  # 0 = no orbax checkpoints
    resume: bool = False  # resume from the latest checkpoint in outdir/ckpt
    seed: int = 0
    verbose: bool = True


def make_dynamic_train_step(
    cfg: DynamicTrainConfig, device_pool: bool = False
) -> Callable:
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    d_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    target = jnp.asarray(cfg.target_sigma)

    def step(state: GANTrainState, hr: jax.Array, crop_src: jax.Array):
        rng, k_crop, k_noise = jax.random.split(state.rng, 3)
        real = random_crops(k_crop, crop_src, cfg.lr_crop_size)
        _, fake, _ = degradation_model_forward(state.g_params, k_noise, hr, cfg.model)

        def d_loss_fn(d_params, d_state):
            pred_real, st = discriminator_forward(d_params, d_state, real, train=True)
            pred_fake, st = discriminator_forward(
                d_params, st, jax.lax.stop_gradient(fake), train=True
            )
            return lsgan_d_loss(pred_real, pred_fake), st

        (loss_d, d_state), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.d_state
        )
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        def g_loss_fn(g_params, d_state_in):
            _, fake_g, sigma = degradation_model_forward(
                g_params, k_noise, hr, cfg.model
            )
            pred_fake, st = discriminator_forward(d_params, d_state_in, fake_g, train=True)
            adv = lsgan_g_loss(pred_fake)
            ks = extract_dynamic_kernels(g_params["generator"], hr, cfg.model)
            reg = per_band_kernel_regularization(
                ks, cfg.reg_weights, center_max=False
            )
            nreg = noise_reg_loss(sigma, target)
            loss = adv + reg + cfg.noise_reg_weight * nreg
            return loss, (st, adv, reg, nreg, sigma, ks)

        (loss_g, (d_state, adv, reg, nreg, sigma, ks)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, d_state)
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            d_state=d_state,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        metrics = {
            "loss_D": loss_d,
            "loss_G_adv": adv,
            "loss_reg": reg,
            "loss_noise_reg": nreg,
            "sigma": sigma,
            "kernels": ks,
        }
        return new_state, metrics

    if device_pool and cfg.steps_per_call > 1:
        return (
            make_chunk_step(step, cfg.batch_size, cfg.steps_per_call),
            (g_tx, d_tx),
        )

    return jax.jit(step, donate_argnums=(0,)), (g_tx, d_tx)


# The dynamic trainer's 4th logged metric is the NOISE regularizer, not a
# weighted kernel reg — its header must say so (the analyzer parses columns
# by name, so reusing the single-kernel header would silently mislabel it)
DYN_LOG_HEADER = "Iteration,Loss_D,Loss_G_adv,Loss_Reg,Loss_Noise_Reg\n"
_DYN_LOG_KEYS = ("loss_D", "loss_G_adv", "loss_reg", "loss_noise_reg")


def _format_dyn_rows(rows: list) -> list[str]:
    from .single_kernel import _format_rows

    return _format_rows(rows, keys=_DYN_LOG_KEYS)


def init_dynamic_training(cfg: DynamicTrainConfig) -> GANTrainState:
    key = jax.random.PRNGKey(cfg.seed)
    k_g, k_d, k_s = jax.random.split(key, 3)
    g_params = init_degradation_model(k_g, cfg.model)
    d_params, d_state = init_discriminator(k_d, cfg.discriminator)
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    d_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    return init_gan_state(k_s, g_params, d_params, d_state, g_tx, d_tx)


def train_dynamic(
    pool: PatchPool,
    cfg: DynamicTrainConfig = DynamicTrainConfig(),
    mesh=None,
    progress: bool = True,
) -> dict:
    os.makedirs(cfg.outdir, exist_ok=True)
    visuals = os.path.join(cfg.outdir, "visuals")
    final_dir = os.path.join(cfg.outdir, "final_results")
    os.makedirs(visuals, exist_ok=True)
    os.makedirs(final_dir, exist_ok=True)
    log_file = os.path.join(cfg.outdir, "training_log.txt")

    check_mesh_vs_scan(cfg, mesh)
    use_device_pool = cfg.device_pool
    if use_device_pool is None:
        use_device_pool = (
            mesh is None
            and hasattr(pool, "patches")
            and pool.patches.nbytes <= 4 << 30
        )
    K = cfg.steps_per_call
    check_scan_intervals(
        cfg,
        {"iters": cfg.iters, "log_every": cfg.log_every,
         "kernel_log_every": cfg.kernel_log_every,
         "ckpt_every": cfg.ckpt_every},
        use_device_pool,
    )

    step_fn, _ = make_dynamic_train_step(cfg, device_pool=use_device_pool)
    state = init_dynamic_training(cfg)

    ckpt_dir = os.path.join(cfg.outdir, "ckpt")
    state, start_iter = maybe_resume(cfg, state, ckpt_dir, announce=cfg.verbose)
    if start_iter == 0:
        with open(log_file, "w", encoding="utf-8") as f:
            f.write(DYN_LOG_HEADER)

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        state = jax.device_put(state, replicated(mesh))

    host_rng = np.random.default_rng(cfg.seed + start_iter)
    rows: list = []
    if K > 1:
        iterator = range(start_iter + K - 1, cfg.iters, K)
    else:
        iterator = range(start_iter, cfg.iters)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(
                iterator, desc="Training dynamic", unit="chunk" if K > 1 else "iter"
            )
        except ImportError:
            pass

    put = jnp.asarray
    if mesh is not None:
        from ..parallel.mesh import shard_batch
        import functools

        put = functools.partial(shard_batch, mesh)

    pool_dev = jnp.asarray(pool.patches) if use_device_pool else None
    n_pool = len(pool)
    take = jax.jit(lambda p, i: jnp.take(p, i, axis=0)) if use_device_pool else None

    for t in iterator:
        if K > 1:
            state, ms = step_fn(state, pool_dev)
            rows.append((t + 2 - K, ms))
            m = jax.tree_util.tree_map(lambda a: a[-1], ms)
        elif use_device_pool:
            hr = take(pool_dev, jnp.asarray(host_rng.integers(0, n_pool, cfg.batch_size)))
            crop_src = take(pool_dev, jnp.asarray(host_rng.integers(0, n_pool, cfg.batch_size)))
            state, m = step_fn(state, hr, crop_src)
            rows.append((t + 1, m))
        else:
            hr = put(pool.sample(host_rng, cfg.batch_size))
            crop_src = put(pool.sample(host_rng, cfg.batch_size))
            state, m = step_fn(state, hr, crop_src)
            rows.append((t + 1, m))
        if (t + 1) % cfg.log_every == 0:
            with open(log_file, "a", encoding="utf-8") as f:
                f.writelines(_format_dyn_rows(rows))
            rows.clear()
        if (t + 1) % cfg.kernel_log_every == 0:
            ks = np.asarray(m["kernels"])
            merged = ks.mean(axis=0)
            km = kernel_metrics(merged)
            art = ascii_kernel(merged)
            with open(
                os.path.join(visuals, f"kernel_ascii_iter{t + 1}.txt"), "w"
            ) as f:
                f.write(art + "\n")
            np.save(os.path.join(cfg.outdir, f"batch_kernels_iter{t + 1}.npy"), ks)
            if cfg.verbose:
                print(
                    f"  [iter {t + 1}] sigma={np.asarray(m['sigma']).round(3)} "
                    f"k_sum={km['k_sum']:.4f} center_off={km['center_offset']:.3f}"
                )
        if cfg.ckpt_every and (t + 1) % cfg.ckpt_every == 0:
            from .state import save_checkpoint

            save_checkpoint(ckpt_dir, state, t + 1)
    if rows:
        with open(log_file, "a", encoding="utf-8") as f:
            f.writelines(_format_dyn_rows(rows))

    ks_final = np.asarray(
        extract_dynamic_kernels(jax.device_get(state.g_params)["generator"], None, cfg.model)
    )
    merged = ks_final.mean(axis=0)
    np.save(os.path.join(final_dir, "kernel_per_band.npy"), ks_final)
    np.save(os.path.join(final_dir, "kernel_merged.npy"), merged)
    return {
        "kernel_per_band": ks_final,
        "kernel_merged": merged,
        "state": state,
        "log_file": log_file,
    }


def bulk_extract_kernels(
    state_params: dict,
    pool: PatchPool,
    out_dir: str,
    cfg: DynamicConfig = DynamicConfig(),
    batch_size: int = 8,
) -> list[str]:
    """Extract one per-patch kernel for every pool entry -> kernel_<i>.npy
    (parity: `muti_kernel/train.py:118-188`)."""
    os.makedirs(out_dir, exist_ok=True)
    if not hasattr(pool, "patches"):
        raise ValueError(
            "bulk_extract_kernels needs an in-memory PatchPool (streaming "
            "pools expose sampling only, not positional iteration)"
        )
    paths = []
    n = len(pool)
    for start in range(0, n, batch_size):
        batch = pool.patches[start : start + batch_size]
        ks = np.asarray(
            extract_dynamic_kernels(
                state_params["generator"], jnp.asarray(batch), cfg, reduce_batch=False
            )
        )  # [B, C, kH, kW]
        for i, k in enumerate(ks):
            name = f"kernel_{start + i:05d}"
            if pool.sources:
                stem = os.path.splitext(os.path.basename(pool.sources[start + i]))[0]
                name = f"kernel_{stem}"
            p = os.path.join(out_dir, f"{name}.npy")
            np.save(p, k)
            paths.append(p)
    return paths
