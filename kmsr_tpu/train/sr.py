"""SR model training (framework extension; see models/sr.py).

Trains the pixel-shuffle SR CNN on (hr, lr) pairs produced by the data
factory (`E_make_train_data` stage): L1 loss, Adam with cosine decay,
DP-sharded batch, periodic PSNR/SSIM eval, orbax checkpointing.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.sr import SRConfig, init_sr, sr_forward
from ..ops.metrics import psnr, ssim


@dataclasses.dataclass
class SRTrainConfig:
    iters: int = 20_000
    batch_size: int = 32
    lr_rate: float = 2e-4
    model: SRConfig = dataclasses.field(default_factory=SRConfig)
    compute_dtype: str = "bfloat16"
    log_every: int = 100
    eval_every: int = 1000
    ckpt_every: int = 0      # orbax checkpoint interval (0 = off)
    resume: bool = False     # resume from the latest checkpoint in outdir/ckpt
    outdir: str = "output/sr"
    device_pool: Optional[bool] = None  # keep (lr, hr) pairs in HBM and
    #   gather batches on device; auto for datasets <= 4 GB, single device
    seed: int = 0
    holdout: int = 0         # pairs held out (from the END of the array)
    #   for eval: never sampled in training, so the logged PSNR/SSIM is a
    #   true validation number, not a train-set echo


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SRTrainState:
    step: jax.Array
    params: dict
    opt_state: tuple


def make_sr_train_step(cfg: SRTrainConfig):
    tx = optax.adam(
        optax.cosine_decay_schedule(cfg.lr_rate, cfg.iters, alpha=0.1)
    )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def step(state: SRTrainState, lr_batch: jax.Array, hr_batch: jax.Array):
        def loss_fn(params):
            pred = sr_forward(params, lr_batch, cfg.model, compute_dtype=dtype)
            return jnp.mean(jnp.abs(pred - hr_batch))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return SRTrainState(state.step + 1, params, opt_state), {"l1": loss}

    return jax.jit(step, donate_argnums=(0,)), tx


def init_sr_training(cfg: SRTrainConfig) -> SRTrainState:
    params = init_sr(jax.random.PRNGKey(cfg.seed), cfg.model)
    tx = optax.adam(optax.cosine_decay_schedule(cfg.lr_rate, cfg.iters, alpha=0.1))
    return SRTrainState(jnp.zeros((), jnp.int32), params, tx.init(params))


def evaluate_sr(
    params: dict,
    lr_batch: np.ndarray,
    hr_batch: np.ndarray,
    cfg: SRConfig = SRConfig(),
) -> dict:
    pred = sr_forward(params, jnp.asarray(lr_batch), cfg, compute_dtype=jnp.float32)
    rng_range = float(np.nanmax(hr_batch) - np.nanmin(hr_batch)) or 1.0
    ps, ss = [], []
    for i in range(pred.shape[0]):
        ps.append(float(psnr(pred[i], jnp.asarray(hr_batch[i]), rng_range)))
        ss.append(float(ssim(pred[i], jnp.asarray(hr_batch[i]), rng_range)))
    return {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}


def train_sr(
    pairs: tuple[np.ndarray, np.ndarray],
    cfg: SRTrainConfig = SRTrainConfig(),
    mesh=None,
    progress: bool = True,
) -> dict:
    """pairs: (lr [N,C,h,w], hr [N,C,H,W]) arrays.

    Writes `<outdir>/training_log.csv` with one row per log_every iters
    (iter, l1) and the PSNR/SSIM columns filled on eval_every iters —
    same CSV-log observability contract as the kernel trainers
    (`single_kernel/train.py:156-158,305-307`); with cfg.holdout > 0 the
    eval set is a held-out tail of the pairs, never trained on.
    """
    lr_all, hr_all = pairs
    assert lr_all.shape[0] == hr_all.shape[0]
    lr_val = hr_val = None
    if cfg.holdout:
        if cfg.holdout >= lr_all.shape[0]:
            raise ValueError(
                f"holdout {cfg.holdout} >= dataset size {lr_all.shape[0]}"
            )
        lr_val, hr_val = lr_all[-cfg.holdout:], hr_all[-cfg.holdout:]
        lr_all, hr_all = lr_all[: -cfg.holdout], hr_all[: -cfg.holdout]
    os.makedirs(cfg.outdir, exist_ok=True)
    if mesh is not None and cfg.device_pool:
        raise ValueError(
            "mesh data-parallelism shards host-sampled batches and is "
            "incompatible with device_pool (it pins the pool to ONE device)"
        )
    step_fn, _ = make_sr_train_step(cfg)
    state = init_sr_training(cfg)

    start_iter = 0
    ckpt_dir = os.path.join(cfg.outdir, "ckpt")
    if cfg.resume:
        from .state import latest_checkpoint_step, restore_checkpoint

        last = latest_checkpoint_step(ckpt_dir)
        if last is not None:
            state = restore_checkpoint(ckpt_dir, last, state)
            start_iter = last
            if progress:
                print(f"resumed from checkpoint step {last}")

    if mesh is not None:
        from ..parallel.mesh import replicated

        state = jax.device_put(state, replicated(mesh))
    host_rng = np.random.default_rng(cfg.seed + start_iter)
    log = []
    iterator = range(start_iter, cfg.iters)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="Training SR", unit="iter")
        except ImportError:
            pass
    put = jnp.asarray
    if mesh is not None:
        import functools

        from ..parallel.mesh import shard_batch

        put = functools.partial(shard_batch, mesh)
    use_device_pool = cfg.device_pool
    if use_device_pool is None:
        use_device_pool = (
            mesh is None and lr_all.nbytes + hr_all.nbytes <= 4 << 30
        )
    if use_device_pool:
        lr_dev, hr_dev = jnp.asarray(lr_all), jnp.asarray(hr_all)
        take = jax.jit(lambda a, b, i: (jnp.take(a, i, axis=0), jnp.take(b, i, axis=0)))

    csv_path = os.path.join(cfg.outdir, "training_log.csv")
    csv_f = open(  # append on resume, fresh header otherwise
        csv_path, "a" if (cfg.resume and start_iter) else "w",
        encoding="utf-8",
    )
    if not (cfg.resume and start_iter):
        csv_f.write("Iteration,Loss_L1,Eval_PSNR,Eval_SSIM\n")
    last_eval: dict = {}

    def eval_now(t):
        if lr_val is not None:
            lr_e, hr_e = lr_val, hr_val
        else:
            i = host_rng.integers(0, lr_all.shape[0], min(8, lr_all.shape[0]))
            lr_e, hr_e = lr_all[i], hr_all[i]
        ev = evaluate_sr(state.params, lr_e, hr_e, cfg.model)
        if progress:
            tag = "holdout" if lr_val is not None else "train-sample"
            print(f"  [eval iter {t}] {tag} psnr={ev['psnr']:.2f} "
                  f"ssim={ev['ssim']:.4f}")
        return ev

    for t in iterator:
        idx = host_rng.integers(0, lr_all.shape[0], cfg.batch_size)
        if use_device_pool:
            lr_b, hr_b = take(lr_dev, hr_dev, jnp.asarray(idx))
        else:
            lr_b, hr_b = put(lr_all[idx]), put(hr_all[idx])
        state, m = step_fn(state, lr_b, hr_b)
        is_eval = (t + 1) % cfg.eval_every == 0
        if is_eval:
            last_eval = eval_now(t + 1)
        if (t + 1) % cfg.log_every == 0 or is_eval:
            l1 = float(m["l1"])
            log.append((t + 1, l1))
            csv_f.write(
                f"{t + 1},{l1:.6f},"
                + (f"{last_eval['psnr']:.4f},{last_eval['ssim']:.6f}\n"
                   if is_eval else ",\n")
            )
            csv_f.flush()
        if cfg.ckpt_every and (t + 1) % cfg.ckpt_every == 0:
            from .state import save_checkpoint

            save_checkpoint(ckpt_dir, state, t + 1)
    final_eval = eval_now(cfg.iters) if (lr_val is not None) else last_eval
    csv_f.close()
    from ..utils.params_io import save_params

    params = jax.device_get(state.params)
    model_path = os.path.join(cfg.outdir, "sr_model.npz")
    save_params(model_path, params)
    return {"state": state, "log": log, "model_path": model_path,
            "final_eval": final_eval, "csv_path": csv_path}
