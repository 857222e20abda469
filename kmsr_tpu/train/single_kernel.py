"""Single-kernel (static per-band) KernelGAN training — pjit'd TPU loop.

Capability parity with `single_kernel/train.py:121-355`: unpaired LSGAN
between G(HR 256^2) -> fake 32^2 and independent real 32^2 crops, Adam
(4e-4, betas (0.5, 0.999)), global grad clip 20, kernel regularizer
(alpha .5, beta .5, gamma 5, delta 1, epsilon 3) at weight 0.002, CSV
loss log with the same header, kernel metrics / ASCII / intermediate
kernel .npy dumps every 100 iters, final kernel_per_band.npy [5,13,13] +
kernel_merged.npy [13,13].

TPU-first differences (by design, not translation):
  * D-step + G-step are ONE jitted function: both model updates, the
    spectral-norm power iterations, BN stats, the closed-form kernel
    extraction and the regularizer all execute on-device per iteration.
  * Data comes from an in-memory `PatchPool` (no per-iter file IO).
  * The batch axis is sharded over a `Mesh` ('data' axis); XLA inserts the
    gradient all-reduce over ICI. Params/optimizer state are replicated.
  * Real-crop sampling runs on device from the HR batch's sibling batch
    (random offsets from the threaded PRNG key), keeping host RNG only
    for file-index choice, mirroring reference sampling structure.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.sampler import PatchPool
from ..losses import lsgan_d_loss, lsgan_g_loss, per_band_kernel_regularization
from ..models.discriminator import (
    DiscriminatorConfig,
    discriminator_forward,
    init_discriminator,
)
from ..models.generator import (
    GeneratorConfig,
    extract_kernels,
    extract_kernels_raw,
    generator_forward,
    init_generator,
)
from ..analysis.kernel_metrics import ascii_kernel, kernel_delta_l2, kernel_metrics
from .state import (
    GANTrainState,
    check_mesh_vs_scan,
    check_scan_intervals,
    init_gan_state,
    make_gan_optimizers,
    maybe_resume,
    make_chunk_step,
)

LOG_HEADER = "Iteration,Loss_D,Loss_G_adv,Loss_Reg,Loss_Reg_weighted\n"
_LOG_KEYS = ("loss_D", "loss_G_adv", "loss_reg", "loss_reg_weighted")


def _format_rows(rows: list, keys: tuple = _LOG_KEYS) -> list[str]:
    """[(first_iter, device-metrics)] -> CSV lines; metrics may be per-step
    scalars or K-stacked scan outputs (single host sync per flush)."""
    out = []
    for i0, m in rows:
        cols = [np.atleast_1d(np.asarray(m[k])) for k in keys]
        for j in range(cols[0].shape[0]):
            out.append(
                f"{i0 + j}," + ",".join(f"{c[j]:.6f}" for c in cols) + "\n"
            )
    return out


@dataclasses.dataclass
class SingleKernelConfig:
    iters: int = 10_000
    hr_patch_size: int = 256
    lr_crop_size: int = 32
    batch_size: int = 16
    lr_rate: float = 4e-4
    reg_weight: float = 0.002
    grad_clip_norm: float = 20.0
    log_every: int = 100
    kernel_log_every: int = 100
    save_intermediate: bool = True
    differentiable_reg: bool = False  # reference quirk: reg has no G-gradient
    real_is_lr: bool = False  # crop_src is already real LR at lr_crop_size
    #   (reference crops 32^2 windows from 256^2 LR-sensor patches —
    #   `single_kernel/train.py:261-268`; set True to feed native-scale
    #   LR batches directly)
    raw_sum_reg: float = 0.0  # weight of mean_b (sum(raw_kernel_b) - 1)^2
    #   on the UN-clamped composed kernel — the clamped extraction zeroes
    #   gradients at negative entries, so the reference's sum-to-1 term
    #   (always computed post-normalize, hence vestigial there too) cannot
    #   stop a band's raw kernel drifting all-negative; this term can.
    #   0 = reference behavior.
    d_border_crop: int = 0  # crop this many pixels off every side of BOTH
    #   D inputs. With real_is_lr the fake side always carries the
    #   generator's reflect-padding rim (13x13 chain -> 6 HR px -> ~1 LR
    #   px after x8 pooling) while native-LR patches are interior crops
    #   of a full scene — a per-pixel patch critic can win on that rim
    #   alone, starving the kernel of gradient. Cropping the rim from
    #   both sides removes the shortcut. 0 = reference behavior.
    d_lr_rate: Optional[float] = None  # D's Adam lr; None = lr_rate (the
    #   reference ties them, `single_kernel/train.py:165-166`). Lowering
    #   D's lr is the standard rebalance when D saturates against a
    #   distribution-shifted real side (real_is_lr).
    fake_noise_learnable: bool = False  # make the fake-side sigma a
    #   LEARNABLE per-band parameter (g_params["log_sigma"], exp +
    #   clip [1e-4, 4]) initialized from fake_noise_sigma — the
    #   reference's NoiseEstimator mechanism (`muti_kernel/
    #   networks.py:210-224`, x + randn*sigma with sigma a parameter):
    #   the reparametrized noise gives the adversary gradient through
    #   sigma, so it self-calibrates to the real side's noise floor.
    #   Needed because no closed-form LR sigma estimator survives
    #   mesoscale structure at the LR Nyquist (wavelet-MAD reads 0.66
    #   for a true 0.55; NLM-residual reads 0.91 — measured, r5 A/B)
    #   and the D detects the variance mismatch.
    fake_noise_sigma: Optional[tuple] = None  # per-band sigmas added to the
    #   FAKE side (G(HR) + N(0, sigma)) so the D cannot win on noise
    #   texture alone when the real side is a noisier native-LR sensor
    #   (real_is_lr). This is the reference's NoiseEstimator idea
    #   (`muti_kernel/networks.py:210-224`) with sigma MEASURED from the
    #   LR pool (ops.sigma wavelet-MAD, the denoise stage's estimator)
    #   instead of learned — the LR sensor's noise floor is observable,
    #   so estimating beats adversarially fitting it. None = off (exact
    #   reference single-kernel behavior, identical RNG stream).
    reg_weights: dict = dataclasses.field(
        default_factory=lambda: dict(alpha=0.5, beta=0.5, gamma=5.0, delta=1.0, epsilon=3.0)
    )
    generator: GeneratorConfig = dataclasses.field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    outdir: str = "output/kernelgan_single"
    ckpt_every: int = 0  # 0 = no orbax checkpoints
    resume: bool = False  # resume from the latest checkpoint in outdir/ckpt
    device_pool: Optional[bool] = None  # keep the whole patch pool in HBM and
    #   gather batches on device (no per-iter host->device batch upload).
    #   None = auto: on for in-memory pools <= 4 GB on a single device.
    steps_per_call: int = 1  # >1: run K steps per dispatch as one on-device
    #   lax.scan (index sampling moves to the device PRNG) — removes the
    #   per-step host round-trip entirely. Requires device_pool; iters,
    #   log_every, kernel_log_every and ckpt_every must be multiples of K.
    #   K=1 keeps the reference's host-RNG sampling stream exactly.
    seed: int = 0
    verbose: bool = True


def random_crops(key: jax.Array, src: jax.Array, crop: int) -> jax.Array:
    """Per-sample random crops on device. src: [B, C, H, W] -> [B, C, c, c]."""
    b, c, h, w = src.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h - crop + 1)
    xs = jax.random.randint(kx, (b,), 0, w - crop + 1)

    def crop_one(img, y, x):
        return jax.lax.dynamic_slice(img, (0, y, x), (c, crop, crop))

    return jax.vmap(crop_one)(src, ys, xs)


def make_base_step(cfg: SingleKernelConfig) -> Callable:
    """The UNJITTED combined D+G step: step(state, hr, crop_src) ->
    (new_state, metrics). Pure function of its inputs — `make_train_step`
    jits it; `train.fleet` vmaps it over a scene axis."""
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=cfg.grad_clip_norm)
    d_tx = make_gan_optimizers(cfg.d_lr_rate or cfg.lr_rate,
                               grad_clip_norm=cfg.grad_clip_norm)
    factor = cfg.generator.factor
    fwd_mode = cfg.generator.forward_mode
    bc = cfg.d_border_crop

    def _trim(x):
        return x[..., bc:-bc, bc:-bc] if bc else x

    fake_sig = (
        jnp.asarray(cfg.fake_noise_sigma, jnp.float32)[None, :, None, None]
        if cfg.fake_noise_sigma is not None else None
    )
    noise_on = fake_sig is not None

    def _sigma_of(g_params):
        """Effective fake-side sigma [1, C, 1, 1] for these G params."""
        if cfg.fake_noise_learnable:
            return jnp.clip(
                jnp.exp(g_params["log_sigma"]), 1e-4, 4.0
            )[None, :, None, None]
        return fake_sig

    def step(state: GANTrainState, hr: jax.Array, crop_src: jax.Array):
        if not noise_on:
            rng, k_crop = jax.random.split(state.rng)
        else:
            rng, k_crop, k_n1, k_n2 = jax.random.split(state.rng, 4)
        if cfg.real_is_lr:
            real = crop_src
        else:
            real = random_crops(k_crop, crop_src, cfg.lr_crop_size)
        fake = generator_forward(state.g_params, hr, factor=factor, forward_mode=fwd_mode)
        if noise_on:
            # fresh draw per D/G sub-step, mirroring the dynamic model's
            # re-run forward (`muti_kernel/train.py:259` vs `:273`)
            fake = fake + jax.random.normal(k_n1, fake.shape) * _sigma_of(
                state.g_params)

        # ---- D step -------------------------------------------------------
        def d_loss_fn(d_params, d_state):
            pred_real, st = discriminator_forward(
                d_params, d_state, _trim(real), train=True
            )
            pred_fake, st = discriminator_forward(
                d_params, st, _trim(jax.lax.stop_gradient(fake)), train=True
            )
            return lsgan_d_loss(pred_real, pred_fake), st

        (loss_d, d_state), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, state.d_state
        )
        d_grad_norm = optax.global_norm(d_grads)
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G step (against the freshly updated D, reference order) -------
        def g_loss_fn(g_params, d_state_in):
            fake_g = generator_forward(g_params, hr, factor=factor, forward_mode=fwd_mode)
            if noise_on:
                # reparametrized: gradient flows into log_sigma when
                # learnable, self-calibrating it against the real side
                fake_g = fake_g + jax.random.normal(
                    k_n2, fake_g.shape) * _sigma_of(g_params)
            pred_fake, st = discriminator_forward(
                d_params, d_state_in, _trim(fake_g), train=True
            )
            adv = lsgan_g_loss(pred_fake)
            ks = extract_kernels(g_params, differentiable=cfg.differentiable_reg)
            reg = per_band_kernel_regularization(ks, cfg.reg_weights)
            total = adv + cfg.reg_weight * reg
            if cfg.raw_sum_reg:
                raw_sums = jnp.sum(extract_kernels_raw(g_params), axis=(1, 2))
                total = total + cfg.raw_sum_reg * jnp.mean(
                    (raw_sums - 1.0) ** 2)
            return total, (st, adv, reg, ks)

        (loss_g, (d_state, adv, reg, ks)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params, d_state)
        g_grad_norm = optax.global_norm(g_grads)
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
            "loss_reg_weighted": cfg.reg_weight * reg,
            "grad_norm_D": d_grad_norm,
            "grad_norm_G": g_grad_norm,
            "kernels": ks,  # [C, kH, kW] — free: already extracted in-step
        }
        return new_state, metrics

    return step


def make_train_step(cfg: SingleKernelConfig, device_pool: bool = False) -> Callable:
    """Build the jitted combined D+G train step.

    step(state, hr_batch, crop_src_batch) -> (new_state, metrics), or with
    `device_pool=True`: step(state, pool_dev, hr_idx, crop_idx) — the batch
    gather happens on device from an HBM-resident pool, so each iteration
    uploads two int32 index vectors instead of ~2x batch x 5 x 256^2 floats.
    (The optimizer transforms live inside the step, built by
    `make_base_step`; the state they update comes from `init_training`.)
    """
    step = make_base_step(cfg)

    if device_pool and cfg.steps_per_call > 1:
        return make_chunk_step(step, cfg.batch_size, cfg.steps_per_call)

    if device_pool:

        def pool_step(state, pool_dev, hr_idx, crop_idx):
            return step(
                state,
                jnp.take(pool_dev, hr_idx, axis=0),
                jnp.take(pool_dev, crop_idx, axis=0),
            )

        return jax.jit(pool_step, donate_argnums=(0,))

    return jax.jit(step, donate_argnums=(0,))


def init_training(cfg: SingleKernelConfig):
    key = jax.random.PRNGKey(cfg.seed)
    k_d, k_state = jax.random.split(key)
    g_params = init_generator(cfg.generator)
    if cfg.fake_noise_learnable:
        if cfg.fake_noise_sigma is None:
            raise ValueError(
                "fake_noise_learnable needs fake_noise_sigma as the init "
                "(e.g. the wavelet-MAD estimate of the LR pool)"
            )
        g_params["log_sigma"] = jnp.log(
            jnp.asarray(cfg.fake_noise_sigma, jnp.float32)
        )
    d_params, d_state = init_discriminator(k_d, cfg.discriminator)
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=cfg.grad_clip_norm)
    d_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=cfg.grad_clip_norm)
    return init_gan_state(k_state, g_params, d_params, d_state, g_tx, d_tx)


def train_single_kernel(
    pool: PatchPool,
    cfg: SingleKernelConfig = SingleKernelConfig(),
    mesh=None,
    progress: bool = True,
    lr_pool: PatchPool | None = None,
) -> dict:
    """Run the full single-kernel KernelGAN loop over a patch pool.

    lr_pool optionally supplies the real-LR side from a SEPARATE pool
    (with cfg.real_is_lr, its patches are used as-is at lr_crop_size;
    without it, random crops are taken from it instead of from `pool`).

    Returns {"kernel_per_band": [C,13,13], "kernel_merged": [13,13],
    "state": final GANTrainState, "log_file": path}.
    """
    os.makedirs(cfg.outdir, exist_ok=True)
    log_file = os.path.join(cfg.outdir, "training_log.txt")

    if cfg.real_is_lr:
        if lr_pool is None:
            raise ValueError(
                "real_is_lr=True needs lr_pool (a pool of native-LR patches "
                f"at lr_crop_size={cfg.lr_crop_size}); without it the 'real' "
                "side would be full HR patches from `pool`"
            )
        if lr_pool.shape[-1] != cfg.lr_crop_size:
            raise ValueError(
                f"real_is_lr=True needs lr_pool patches at lr_crop_size="
                f"{cfg.lr_crop_size}, got {lr_pool.shape[-1]}"
            )
    if lr_pool is not None and (cfg.device_pool or cfg.steps_per_call > 1):
        raise ValueError(
            "lr_pool mode samples on host; incompatible with device_pool / "
            "steps_per_call > 1"
        )

    check_mesh_vs_scan(cfg, mesh)
    # device-resident pool: auto on for single-device in-memory pools <= 4 GB
    use_device_pool = cfg.device_pool
    if use_device_pool is None:
        use_device_pool = (
            mesh is None
            and lr_pool is None
            and hasattr(pool, "patches")
            and pool.patches.nbytes <= 4 << 30
        )
    if use_device_pool and not hasattr(pool, "patches"):
        raise ValueError("device_pool needs an in-memory PatchPool")

    step_fn = make_train_step(cfg, device_pool=use_device_pool)
    state = init_training(cfg)

    # checkpoint resume (the reference has no resume path at all —
    # `muti_kernel/train.py:344-362` is commented out)
    ckpt_dir = os.path.join(cfg.outdir, "ckpt")
    state, start_iter = maybe_resume(cfg, state, ckpt_dir, announce=cfg.verbose)
    if start_iter == 0:
        with open(log_file, "w", encoding="utf-8") as f:
            f.write(LOG_HEADER)

    if mesh is not None:
        from ..parallel.mesh import replicated, shard_batch

        state = jax.device_put(state, replicated(mesh))
        # shard_batch (not a bare device_put) so a multi-host launch
        # assembles each host's locally-sampled rows into the global batch
        put_batch = functools.partial(shard_batch, mesh)
    else:
        put_batch = jnp.asarray

    host_rng = np.random.default_rng(cfg.seed + start_iter)
    prev_k = None
    log_rows: list = []
    pool_dev = jnp.asarray(pool.patches) if use_device_pool else None
    n_pool = len(pool)
    K = cfg.steps_per_call
    check_scan_intervals(
        cfg,
        {"iters": cfg.iters, "log_every": cfg.log_every,
         "kernel_log_every": cfg.kernel_log_every,
         "ckpt_every": cfg.ckpt_every},
        use_device_pool,
    )
    if K > 1:
        # t iterates over the LAST iteration index of each K-step chunk
        iterator = range(start_iter + K - 1, cfg.iters, K)
    else:
        iterator = range(start_iter, cfg.iters)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="Training", unit="chunk" if K > 1 else "iter")
        except ImportError:
            pass

    for t in iterator:
        if K > 1:
            # K steps in one dispatch: on-device PRNG index sampling,
            # stacked metrics; t is the LAST iteration of the chunk
            state, ms = step_fn(state, pool_dev)
            log_rows.append((t + 2 - K, ms))
            metrics = jax.tree_util.tree_map(lambda a: a[-1], ms)
        elif use_device_pool:
            # identical host-RNG stream to pool.sample's index draws
            hr_idx = host_rng.integers(0, n_pool, size=cfg.batch_size)
            crop_idx = host_rng.integers(0, n_pool, size=cfg.batch_size)
            state, metrics = step_fn(
                state, pool_dev, jnp.asarray(hr_idx), jnp.asarray(crop_idx)
            )
        else:
            hr = put_batch(pool.sample(host_rng, cfg.batch_size))
            crop_src = put_batch(
                (lr_pool if lr_pool is not None else pool).sample(
                    host_rng, cfg.batch_size
                )
            )
            state, metrics = step_fn(state, hr, crop_src)

        # CSV rows are buffered as DEVICE scalars and materialized only at
        # flush time: a float() per iteration would force a device sync per
        # step (the reference reopens the log file per iteration, which we
        # deliberately do not reproduce either).
        if K == 1:
            log_rows.append((t + 1, metrics))

        if (t + 1) % cfg.log_every == 0:
            with open(log_file, "a", encoding="utf-8") as f:
                f.writelines(_format_rows(log_rows))
            log_rows.clear()
            if progress and hasattr(iterator, "set_postfix"):
                iterator.set_postfix(
                    D=f"{float(metrics['loss_D']):.4f}",
                    G_adv=f"{float(metrics['loss_G_adv']):.4f}",
                    RegW=f"{float(metrics['loss_reg_weighted']):.4f}",
                    gN_D=f"{float(metrics['grad_norm_D']):.2f}",
                    gN_G=f"{float(metrics['grad_norm_G']):.2f}",
                )

        if (t + 1) % cfg.kernel_log_every == 0:
            ks = np.asarray(metrics["kernels"])  # [C,kH,kW]
            k_merged = ks.mean(axis=0)
            km = kernel_metrics(k_merged)
            delta = kernel_delta_l2(k_merged, prev_k)
            prev_k = k_merged.copy()
            if cfg.verbose:
                print(
                    f"  [Kernel] shape={km['k_shape']} sum={km['k_sum']:.4f} "
                    f"max={km['k_max']:.4f} std={km['k_std']:.4f} "
                    f"sparsity={km['sparsity']:.3f} "
                    f"center_offset={km['center_offset']:.3f} delta_L2={delta:.5f}"
                )
                print("  [Kernel ASCII merged]\n" + ascii_kernel(k_merged))
            if cfg.save_intermediate:
                np.save(os.path.join(cfg.outdir, f"kernel_iter{t + 1}.npy"), k_merged)
                np.save(
                    os.path.join(cfg.outdir, f"kernel_per_band_iter{t + 1}.npy"), ks
                )

        if cfg.ckpt_every and (t + 1) % cfg.ckpt_every == 0:
            from .state import save_checkpoint

            save_checkpoint(ckpt_dir, state, t + 1)

    if log_rows:
        with open(log_file, "a", encoding="utf-8") as f:
            f.writelines(_format_rows(log_rows))

    ks_final = np.asarray(extract_kernels(state.g_params))
    k_merged = ks_final.mean(axis=0)
    np.save(os.path.join(cfg.outdir, "kernel_per_band.npy"), ks_final)
    np.save(os.path.join(cfg.outdir, "kernel_merged.npy"), k_merged)
    return {
        "kernel_per_band": ks_final,
        "kernel_merged": k_merged,
        "state": state,
        "log_file": log_file,
    }
