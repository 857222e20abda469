"""Mixture-of-kernels (MoE bank) training.

Schedule parity with `muti_kernel/train_gemini.py:145-252`: 5000 iters,
Adam 1e-4 for model (selector + banks) and D, Gumbel temperature annealed
linspace(5.0 -> 0.5), LSGAN; G regularized by the per-band 4-term kernel
regularizer on the MEAN of the bank's effective kernels (differentiable —
the bank is parameterized directly, no extraction quirk here); selection
histogram logged every 100 iters; artifacts: `moe_kernels/kernel_{i}.npy`
(5,13,13 each, band-sum 1), `sigma_{i}.npy` (5,), and a full model
checkpoint (npz of flattened params — the reference saves a torch
state_dict `moe_model.pth`).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.sampler import PatchPool
from ..losses import (
    load_balance_loss,
    lsgan_d_loss,
    lsgan_g_loss,
    per_band_kernel_regularization,
)
from ..models.discriminator import (
    DiscriminatorConfig,
    discriminator_forward,
    init_discriminator,
)
from ..models.moe import (
    MoEConfig,
    effective_kernels,
    effective_sigmas,
    init_moe,
    moe_forward,
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


@dataclasses.dataclass
class MoETrainConfig:
    iters: int = 5000
    batch_size: int = 8
    hr_patch_size: int = 256
    lr_crop_size: int = 64          # 256 / 4 (::4 decimation)
    lr_rate: float = 1e-4
    temp_start: float = 5.0
    temp_end: float = 0.5
    reg_weights: dict = dataclasses.field(
        default_factory=lambda: dict(alpha=0.5, beta=0.5, gamma=5.0, delta=1.0)
    )
    balance_weight: float = 0.0  # >0: add the Switch-style load-balance
    #   aux loss (`losses.load_balance_loss`) to the G objective — opt-in
    #   mitigation for selector/bank collapse on degradation-homogeneous
    #   data (the reference has no such term and its shipped bank is
    #   itself collapsed; see PARITY.md 2.7)
    model: MoEConfig = dataclasses.field(default_factory=MoEConfig)
    discriminator: DiscriminatorConfig = dataclasses.field(
        default_factory=DiscriminatorConfig
    )
    log_every: int = 100
    outdir: str = "output/moe_kernels_run"
    device_pool: bool | None = None  # HBM-resident pool with on-device
    #   batch gathers (see train.single_kernel); auto for pools <= 4 GB
    steps_per_call: int = 1  # >1: K steps per dispatch as one on-device
    #   lax.scan with device-PRNG index sampling; the annealed temperature
    #   schedule rides the scan as per-step xs (requires device_pool;
    #   iters and log/ckpt intervals must be multiples of K)
    ckpt_every: int = 0  # 0 = no orbax checkpoints
    resume: bool = False  # resume from the latest checkpoint in outdir/ckpt
    seed: int = 0
    verbose: bool = True


def make_moe_train_step(cfg: MoETrainConfig, device_pool: bool = False) -> Callable:
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    d_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)

    def step(state: GANTrainState, hr: jax.Array, crop_src: jax.Array, temp: jax.Array):
        rng, k_crop, k_fwd1, k_fwd2 = jax.random.split(state.rng, 4)
        real = random_crops(k_crop, crop_src, cfg.lr_crop_size)
        moe_params, moe_state = state.g_params, state.d_state["moe"]

        # ---- D step (G forward without gradients, fresh gumbel draw) -----
        fake, _, _, _ = moe_forward(
            moe_params, moe_state, k_fwd1, hr, temp=temp, train=True, cfg=cfg.model
        )
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params, d_state):
            pred_real, st = discriminator_forward(d_params, d_state, real, train=True)
            pred_fake, st = discriminator_forward(d_params, st, fake, train=True)
            return lsgan_d_loss(pred_real, pred_fake), st

        (loss_d, d_disc_state), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.d_params, state.d_state["disc"])
        d_updates, d_opt_state = d_tx.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---- G step (selector + banks) -----------------------------------
        def g_loss_fn(params, disc_state):
            fake_g, weights, kernels, new_moe_state = moe_forward(
                params, moe_state, k_fwd2, hr, temp=temp, train=True, cfg=cfg.model
            )
            pred_fake, st = discriminator_forward(d_params, disc_state, fake_g, train=True)
            adv = lsgan_g_loss(pred_fake)
            avg_kernel = kernels.mean(axis=0)  # [C, kh, kw]
            reg = per_band_kernel_regularization(
                avg_kernel, cfg.reg_weights, center_max=False
            )
            bal = load_balance_loss(weights)
            total = adv + reg + cfg.balance_weight * bal
            return total, (st, new_moe_state, adv, reg, bal, weights)

        (loss_g, (d_disc_state, new_moe_state, adv, reg, bal, weights)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(moe_params, d_disc_state)
        )
        g_updates, g_opt_state = g_tx.update(g_grads, state.g_opt_state, moe_params)
        g_params = optax.apply_updates(moe_params, g_updates)

        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params,
            d_params=d_params,
            d_state={"disc": d_disc_state, "moe": new_moe_state},
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            rng=rng,
        )
        selection = jnp.sum(
            jax.nn.one_hot(jnp.argmax(weights, axis=1), cfg.model.n_kernels), axis=0
        )
        metrics = {
            "loss_D": loss_d,
            "loss_G_adv": adv,
            "loss_reg": reg,
            "loss_balance": bal,
            "selection": selection,
        }
        return new_state, metrics

    if device_pool and cfg.steps_per_call > 1:
        # the annealed temperature schedule rides the scan's xs
        return (
            make_chunk_step(step, cfg.batch_size, cfg.steps_per_call,
                            scan_xs=True),
            (g_tx, d_tx),
        )

    return jax.jit(step, donate_argnums=(0,)), (g_tx, d_tx)


def init_moe_training(
    cfg: MoETrainConfig, init_from: str | None = None
) -> GANTrainState:
    """`init_from` warm-starts the selector + banks from a checkpoint:
    the reference's torch `moe_model.pth` or this framework's
    `moe_model.npz` (as written by `save_moe_artifacts`)."""
    key = jax.random.PRNGKey(cfg.seed)
    k_m, k_d, k_s = jax.random.split(key, 3)
    moe_params, moe_state = init_moe(k_m, cfg.model)
    if init_from:
        if init_from.endswith(".pth"):
            from ..utils.torch_import import load_moe_torch_checkpoint

            moe_params, moe_state = load_moe_torch_checkpoint(init_from, cfg.model)
        else:
            from ..utils.params_io import load_params

            moe_params = load_params(init_from, moe_params)
            # restore the selector's BN running stats saved alongside the
            # weights (the torch path carries them in the state_dict)
            state_path = os.path.join(
                os.path.dirname(init_from), "moe_state.npz"
            )
            if os.path.exists(state_path):
                moe_state = load_params(state_path, moe_state)
    d_params, disc_state = init_discriminator(k_d, cfg.discriminator)
    g_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    d_tx = make_gan_optimizers(cfg.lr_rate, grad_clip_norm=None)
    state = init_gan_state(
        k_s, moe_params, d_params, {"disc": disc_state, "moe": moe_state}, g_tx, d_tx
    )
    return state


def save_moe_artifacts(
    params: dict, out_dir: str, model_state: dict | None = None
) -> list[str]:
    """kernel_{i}.npy + sigma_{i}.npy + moe_model.npz (state-dict analog).

    model_state (the selector's BN running stats) additionally writes
    moe_state.npz so downstream eval-mode selection (e.g. the factory's
    content-adaptive mode) is batch-independent — the reference's torch
    state_dict carries these implicitly."""
    os.makedirs(out_dir, exist_ok=True)
    kernels = np.asarray(effective_kernels(params))
    sigmas = np.asarray(effective_sigmas(params))
    paths = []
    for i in range(kernels.shape[0]):
        kp = os.path.join(out_dir, f"kernel_{i}.npy")
        sp = os.path.join(out_dir, f"sigma_{i}.npy")
        np.save(kp, kernels[i])
        np.save(sp, sigmas[i])
        paths += [kp, sp]
    from ..utils.params_io import save_params

    model_path = os.path.join(out_dir, "moe_model.npz")
    save_params(model_path, params)  # reloadable via train --init-from
    paths.append(model_path)
    if model_state is not None:
        state_path = os.path.join(out_dir, "moe_state.npz")
        save_params(state_path, model_state)
        paths.append(state_path)
    return paths


def train_moe(
    pool: PatchPool,
    cfg: MoETrainConfig = MoETrainConfig(),
    progress: bool = True,
    init_from: str | None = None,
    mesh=None,
) -> dict:
    """mesh: optional 1-D device mesh with a 'data' axis — the batch is
    DP-sharded and XLA inserts the gradient reductions over ICI (the same
    scheme as `train_single_kernel`/`train_dynamic`)."""
    os.makedirs(cfg.outdir, exist_ok=True)
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
         "ckpt_every": cfg.ckpt_every},
        use_device_pool,
    )
    step_fn, _ = make_moe_train_step(cfg, device_pool=use_device_pool)
    state = init_moe_training(cfg, init_from=init_from)

    ckpt_dir = os.path.join(cfg.outdir, "ckpt")
    state, start_iter = maybe_resume(cfg, state, ckpt_dir, announce=cfg.verbose)

    if mesh is not None:
        from ..parallel.mesh import replicated

        state = jax.device_put(state, replicated(mesh))

    put = jnp.asarray
    if mesh is not None:
        import functools

        from ..parallel.mesh import shard_batch

        put = functools.partial(shard_batch, mesh)

    temps = np.linspace(cfg.temp_start, cfg.temp_end, cfg.iters).astype(np.float32)
    host_rng = np.random.default_rng(cfg.seed + start_iter)

    if K > 1:
        iterator = range(start_iter + K - 1, cfg.iters, K)
    else:
        iterator = range(start_iter, cfg.iters)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(
                iterator, desc="Training MoE", unit="chunk" if K > 1 else "iter"
            )
        except ImportError:
            pass

    pool_dev = jnp.asarray(pool.patches) if use_device_pool else None
    n_pool = len(pool)
    take = jax.jit(lambda p, i: jnp.take(p, i, axis=0)) if use_device_pool else None

    history = []
    for t in iterator:
        if K > 1:
            state, ms = step_fn(state, pool_dev, jnp.asarray(temps[t + 1 - K : t + 1]))
            m = jax.tree_util.tree_map(lambda a: a[-1], ms)
        elif use_device_pool:
            hr = take(pool_dev, jnp.asarray(host_rng.integers(0, n_pool, cfg.batch_size)))
            crop_src = take(pool_dev, jnp.asarray(host_rng.integers(0, n_pool, cfg.batch_size)))
            state, m = step_fn(state, hr, crop_src, jnp.float32(temps[t]))
        else:
            hr = put(pool.sample(host_rng, cfg.batch_size))
            crop_src = put(pool.sample(host_rng, cfg.batch_size))
            state, m = step_fn(state, hr, crop_src, jnp.float32(temps[t]))
        if (t + 1) % cfg.log_every == 0:
            sel = np.asarray(m["selection"]).astype(int)
            history.append((t + 1, float(m["loss_D"]), sel))
            if cfg.verbose:
                print(
                    f"Iter {t + 1} | Temp {temps[t]:.2f} | D {float(m['loss_D']):.3f} "
                    f"| Selection {sel}"
                )
        if cfg.ckpt_every and (t + 1) % cfg.ckpt_every == 0:
            from .state import save_checkpoint

            save_checkpoint(ckpt_dir, state, t + 1)

    artifacts = save_moe_artifacts(
        jax.device_get(state.g_params), cfg.outdir,
        model_state=jax.device_get(state.d_state["moe"]),
    )
    return {"state": state, "artifacts": artifacts, "history": history}
