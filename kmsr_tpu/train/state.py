"""Train state containers + orbax checkpointing.

The reference's only "checkpoints" are kernel .npy dumps every 100 iters
(`single_kernel/train.py:343-347`) with no optimizer state or resume.
Here: full (params, opt_state, mutable state, rng, step) checkpointing via
orbax with resume, *plus* the same kernel-artifact dumps for compatibility.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import optax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GANTrainState:
    """Everything a GAN training step threads through iterations."""

    step: jax.Array
    g_params: Any
    d_params: Any
    d_state: Any          # spectral-norm u vectors + batchnorm stats
    g_opt_state: Any
    d_opt_state: Any
    rng: jax.Array


def make_gan_optimizers(
    lr: float = 4e-4,
    betas: tuple[float, float] = (0.5, 0.999),
    grad_clip_norm: Optional[float] = 20.0,
):
    """Adam(lr, betas) preceded by global-norm clipping.

    Matches the reference schedule: Adam(4e-4, (0.5, 0.999)) with
    clip_grad_norm_(20) applied between backward and step
    (`single_kernel/train.py:165-166,279,302`).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(optax.adam(lr, b1=betas[0], b2=betas[1]))
    return optax.chain(*chain)


def init_gan_state(
    key: jax.Array,
    g_params: Any,
    d_params: Any,
    d_state: Any,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
) -> GANTrainState:
    import jax.numpy as jnp

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        d_state=d_state,
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        rng=key,
    )


# ---------------------------------------------------------------- checkpointing
def save_checkpoint(ckpt_dir: str, state: GANTrainState, step: int) -> None:
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # orbax requires absolute paths (a relative --outdir would raise)
    ckptr.save(
        os.path.abspath(f"{ckpt_dir}/step_{step}"),
        jax.device_get(dataclasses.asdict(state)),
        force=True,
    )
    ckptr.wait_until_finished()


def restore_checkpoint(ckpt_dir: str, step: int, template: GANTrainState) -> GANTrainState:
    """Works for any dataclass train state (GANTrainState, SRTrainState)."""
    import orbax.checkpoint as ocp

    import os

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(f"{ckpt_dir}/step_{step}"),
        jax.device_get(dataclasses.asdict(template)),
    )
    return type(template)(**restored)


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    import os
    import re

    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


# -------------------------------------------------- shared trainer plumbing
def make_chunk_step(step, batch_size: int, steps_per_call: int,
                    scan_xs: bool = False):
    """Wrap a single train step into a jitted K-step on-device lax.scan.

    All three GAN trainers share this body: each scan iteration splits
    the state PRNG, samples HR / real-crop batches from the HBM-resident
    pool by index, and calls `step`. With scan_xs, the chunk takes one
    extra scanned-over array (e.g. the MoE temperature schedule) whose
    leading dim is the chunk length; otherwise the chunk runs
    `steps_per_call` iterations. Returns jit(chunk) with the state donated.
    """
    import jax.numpy as jnp

    def chunk_step(state, pool_dev, *xs):
        n_pool = pool_dev.shape[0]

        def body(st, x):
            rng, k_hr, k_cr = jax.random.split(st.rng, 3)
            hr_idx = jax.random.randint(k_hr, (batch_size,), 0, n_pool)
            cr_idx = jax.random.randint(k_cr, (batch_size,), 0, n_pool)
            st = dataclasses.replace(st, rng=rng)
            return step(
                st,
                jnp.take(pool_dev, hr_idx, axis=0),
                jnp.take(pool_dev, cr_idx, axis=0),
                *((x,) if scan_xs else ()),
            )

        if scan_xs:
            return jax.lax.scan(body, state, xs[0])
        return jax.lax.scan(body, state, None, length=steps_per_call)

    return jax.jit(chunk_step, donate_argnums=(0,))


def check_mesh_vs_scan(cfg, mesh) -> None:
    """Mesh DP shards host-sampled batches; the HBM-pool / scan-chunking
    knobs keep sampling on ONE device — the combination is an error every
    trainer must reject the same way."""
    if mesh is not None and (cfg.device_pool or cfg.steps_per_call > 1):
        raise ValueError(
            "mesh data-parallelism shards host-sampled batches and is "
            "incompatible with device_pool / steps_per_call > 1 (those keep "
            "sampling on ONE device); drop --data-parallel or the scan knobs"
        )


def check_scan_intervals(cfg, intervals: dict, use_device_pool: bool) -> None:
    """steps_per_call=K>1 requires the device pool and every logging /
    checkpoint interval to be a K-multiple (they fire at chunk ends)."""
    k = cfg.steps_per_call
    if k <= 1:
        return
    if not use_device_pool:
        raise ValueError("steps_per_call > 1 requires device_pool")
    for name, v in intervals.items():
        if v % k:
            raise ValueError(f"{name}={v} must be a multiple of steps_per_call={k}")


def maybe_resume(cfg, state, ckpt_dir: str, announce: bool = False):
    """Restore the latest checkpoint when cfg.resume; returns
    (state, start_iter). Validates K-alignment of the resume point."""
    start_iter = 0
    if cfg.resume:
        last = latest_checkpoint_step(ckpt_dir)
        if last is not None:
            state = restore_checkpoint(ckpt_dir, last, state)
            start_iter = last
            if announce:
                print(f"resumed from checkpoint step {last}")
    k = getattr(cfg, "steps_per_call", 1)
    if k > 1 and start_iter % k:
        raise ValueError(f"resume step {start_iter} not a multiple of K={k}")
    return state, start_iter
