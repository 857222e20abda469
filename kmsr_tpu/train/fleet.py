"""Fleet kernel estimation: vmapped per-scene KernelGAN training.

The reference estimates one degradation kernel PER SCENE by running
`single_kernel/train.py:121-355` once per scene, serially, on one
device. The models are tiny (~1M params, batch 16 of 256^2 patches), so
a TPU chip running one scene's GAN is mostly idle.

The TPU-first answer: stack S scenes' training states and patch pools
on device and `vmap` the SAME combined D+G step over the scene axis —
one dispatch advances every scene's GAN one iteration. Because the
per-scene GANs are fully independent, sharding the scene axis over the
mesh scales the fleet across chips with ZERO collectives (this is batch
parallelism over *models*, unlike the 'data' sharding inside one model
in `train_single_kernel`).

Per-scene artifact parity is preserved exactly: each scene gets its own
`training_log.txt` (same CSV header), `kernel_iter{N}.npy` /
`kernel_per_band_iter{N}.npy` dumps, and final `kernel_per_band.npy` +
`kernel_merged.npy`, under `cfg.outdir/<scene_name>/`. Scene s trains
with seed `cfg.seed + s`, so its results are numerically equivalent to
a standalone `train_single_kernel` run at that seed (tested in
`tests/test_train_fleet.py`).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.compat import VMA_KW as _VMA_KW, shard_map
from ..data.sampler import PatchPool
from ..models.generator import extract_kernels
from .single_kernel import (
    LOG_HEADER,
    _LOG_KEYS,
    SingleKernelConfig,
    init_training,
    make_base_step,
)
from .state import maybe_resume, save_checkpoint


def _stack_states(states):
    """Per-scene GANTrainState list -> one state with leading scene axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def _stack_pools(pools: Sequence[PatchPool]) -> tuple[np.ndarray, list[int]]:
    """[S] pools -> ([S, N_max, C, H, W] array, per-scene sizes).

    Pools may differ in size; shorter pools are cycle-padded to N_max.
    Padding rows are NEVER sampled (indices are drawn in [0, n_s) per
    scene), so the padding content is irrelevant — cycling just keeps
    the array NaN-free for the pool's own gate.
    """
    shapes = {p.patches.shape[1:] for p in pools}
    if len(shapes) != 1:
        raise ValueError(f"pools must share the patch shape, got {shapes}")
    sizes = [len(p) for p in pools]
    n_max = max(sizes)
    stacked = np.empty((len(pools), n_max) + pools[0].patches.shape[1:],
                       np.float32)
    for s, p in enumerate(pools):
        stacked[s, : sizes[s]] = p.patches
        for j in range(sizes[s], n_max):
            stacked[s, j] = p.patches[j % sizes[s]]
    return stacked, sizes


def _activation_bytes_per_scene(cfg: SingleKernelConfig, hr_size: int) -> int:
    """Rough HBM residual footprint of ONE scene's chain-mode G step: the
    inputs of every conv layer are saved for the backward pass (f32).
    Compose mode stores only the 5-band input — negligible."""
    g = cfg.generator
    if g.forward_mode != "chain":
        return 4 * cfg.batch_size * g.in_ch * hr_size**2
    chans = g.in_ch  # layer-0 input: the raw bands
    for out_c, _in_c in g.layer_channels[:-1]:
        chans += g.in_ch * out_c  # grouped-conv activations, all bands
    return 4 * cfg.batch_size * chans * hr_size**2


def pick_scene_chunk(cfg: SingleKernelConfig, s_local: int, hr_size: int,
                     budget_bytes: int = 6 << 30) -> int:
    """Largest divisor m of s_local whose m-scene vmapped step keeps the
    estimated chain residuals under `budget_bytes` (min 1). Compose-mode
    fleets always fit — returns s_local there."""
    per_scene = _activation_bytes_per_scene(cfg, hr_size)
    for m in range(s_local, 0, -1):
        if s_local % m == 0 and m * per_scene <= budget_bytes:
            return m
    return 1


def _chunk_scenes(vfn, m: int, s_total: int):
    """vmapped-over-scenes fn -> same fn computed in chunks of m scenes
    via `lax.map` (sequential): peak activation memory drops from
    s_total/m-fold to one chunk's. Per-scene draws and math are the
    same; values agree to f32 reduction order (XLA schedules convs per
    dispatch batch shape — last-ULP loss deltas observed).
    m == s_total returns vfn unchanged (pure vmap, today's behavior)."""
    if m == s_total:
        return vfn
    if s_total % m:
        raise ValueError(f"scene_chunk {m} must divide the scene count "
                         f"{s_total} (per device)")

    def fn(*args):
        args_c = jax.tree_util.tree_map(
            lambda a: a.reshape((s_total // m, m) + a.shape[1:]), args
        )
        out = jax.lax.map(lambda ch: vfn(*ch), args_c)
        return jax.tree_util.tree_map(
            lambda a: a.reshape((s_total,) + a.shape[2:]), out
        )

    return fn


def make_fleet_chunk_step(cfg: SingleKernelConfig, mesh=None,
                          s_local: int | None = None,
                          scene_chunk: int | None = None):
    """K-step scan chunk vmapped over the scene axis:
    (state_S, pool_S, n_pool_S) -> (state_S, metrics_S[..., K-axis]).

    scene_chunk=m (with s_local, the per-device scene count) runs the
    scenes in m-wide vmapped chunks under `lax.map` — chain-mode fleets
    at full patch size exceed one chip's HBM when all scenes' conv
    residuals are alive at once (21.8 GB for 8 scenes at batch 16,
    256^2); chunking bounds that by one chunk (values agree to f32
    reduction order — see `_chunk_scenes`).

    Index sampling moves to each scene's device PRNG stream — the same
    split order and randint draws as the single trainer's
    `make_chunk_step`, so scene s of a chunked fleet is numerically
    IDENTICAL to a standalone `steps_per_call=K` run at seed+s (tested).
    Unlike the single trainer (where scan chunking is incompatible with
    a DP mesh — sampling lives on one device), the fleet's sampling is
    per-scene INSIDE the shard_map, so K>1 composes with scene
    parallelism."""
    base = make_base_step(cfg)
    bs, k_steps = cfg.batch_size, cfg.steps_per_call

    if cfg.real_is_lr:
        # real side gathers from a SEPARATE per-scene native-LR pool
        # (the standalone trainer rejects lr_pool with K>1 because its
        # lr_pool path samples on host; the fleet's pools are always
        # HBM-resident, so device-PRNG sampling extends naturally)
        def one(state, pool_dev, lr_dev, n_pool, n_lr):
            def body(st, _):
                rng, k_hr, k_cr = jax.random.split(st.rng, 3)
                hr_idx = jax.random.randint(k_hr, (bs,), 0, n_pool)
                cr_idx = jax.random.randint(k_cr, (bs,), 0, n_lr)
                st = dataclasses.replace(st, rng=rng)
                return base(
                    st,
                    jnp.take(pool_dev, hr_idx, axis=0),
                    jnp.take(lr_dev, cr_idx, axis=0),
                )

            return jax.lax.scan(body, state, None, length=k_steps)

        n_in = 5
    else:
        def one(state, pool_dev, n_pool):
            def body(st, _):
                rng, k_hr, k_cr = jax.random.split(st.rng, 3)
                hr_idx = jax.random.randint(k_hr, (bs,), 0, n_pool)
                cr_idx = jax.random.randint(k_cr, (bs,), 0, n_pool)
                st = dataclasses.replace(st, rng=rng)
                return base(
                    st,
                    jnp.take(pool_dev, hr_idx, axis=0),
                    jnp.take(pool_dev, cr_idx, axis=0),
                )

            return jax.lax.scan(body, state, None, length=k_steps)

        n_in = 3

    vstep = jax.vmap(one)
    if scene_chunk is not None:
        vstep = _chunk_scenes(vstep, scene_chunk, s_local)
    if mesh is not None:
        axis = mesh.axis_names[0]
        vstep = shard_map(
            vstep,
            mesh=mesh,
            in_specs=(P(axis),) * n_in,
            out_specs=P(axis),
            **_VMA_KW,
        )
    return jax.jit(vstep, donate_argnums=(0,))


def make_fleet_step(cfg: SingleKernelConfig, mesh=None,
                    s_local: int | None = None,
                    scene_chunk: int | None = None):
    """The jitted fleet step: (state_S, pool_S, hr_idx_S, crop_idx_S) ->
    (state_S, metrics_S). Every argument carries a leading scene axis.
    scene_chunk: see `make_fleet_chunk_step`.

    With a mesh, the vmapped step is wrapped in `shard_map` over the
    scene axis: each device runs its local scenes' GANs with no
    collectives. (Plain GSPMD propagation is NOT usable here — vmap
    folds the scene axis into the generator's feature_group_count, and
    the partitioner cannot split that grouped conv across devices.)"""
    base = make_base_step(cfg)

    if cfg.real_is_lr:
        # crop_idx gathers from the per-scene native-LR pool; the base
        # step (cfg.real_is_lr) then uses those patches as-is — same
        # contract as the standalone trainer's lr_pool path
        # (`single_kernel/train.py:261-268` real-side sampling, which
        # the fleet must not narrow)
        def one(state, pool_dev, lr_dev, hr_idx, crop_idx):
            return base(
                state,
                jnp.take(pool_dev, hr_idx, axis=0),
                jnp.take(lr_dev, crop_idx, axis=0),
            )

        n_in = 5
    else:
        def one(state, pool_dev, hr_idx, crop_idx):
            return base(
                state,
                jnp.take(pool_dev, hr_idx, axis=0),
                jnp.take(pool_dev, crop_idx, axis=0),
            )

        n_in = 4

    vstep = jax.vmap(one)
    if scene_chunk is not None:
        vstep = _chunk_scenes(vstep, scene_chunk, s_local)
    if mesh is not None:
        axis = mesh.axis_names[0]
        vstep = shard_map(
            vstep,
            mesh=mesh,
            in_specs=(P(axis),) * n_in,
            out_specs=P(axis),
            **_VMA_KW,
        )
    return jax.jit(vstep, donate_argnums=(0,))


def train_fleet(
    pools: Sequence[PatchPool],
    cfg: SingleKernelConfig = SingleKernelConfig(),
    scene_names: Optional[Sequence[str]] = None,
    mesh=None,
    progress: bool = True,
    scene_chunk: Optional[int] = None,
    lr_pools: Optional[Sequence[PatchPool]] = None,
) -> dict:
    """Train one KernelGAN per pool, all simultaneously.

    scene_chunk: scenes dispatched per vmapped chunk on each device
    (`lax.map` over chunks — bounds chain-mode conv-residual HBM by one
    chunk; values agree to f32 reduction order). None = auto: all
    scenes for compose mode, the largest divisor fitting a ~6 GB
    residual budget for chain mode (`pick_scene_chunk`).

    pools: one PatchPool per scene (HR patches, same [C, H, W] shape).
    cfg: shared hyper-parameters; scene s uses seed `cfg.seed + s` and
    writes artifacts under `cfg.outdir/<scene_names[s]>/`.
    cfg.steps_per_call=K>1 fuses K steps per dispatch into one on-device
    lax.scan with per-scene device-PRNG index sampling (identical to a
    standalone `steps_per_call=K` run at seed+s); K=1 keeps the host-RNG
    stream of a standalone K=1 run. mesh: optional 1-axis mesh — the
    SCENE axis is sharded over it (len(pools) must be a multiple of the
    mesh size; no collectives; composes with either K).

    lr_pools (with cfg.real_is_lr): one pool of GENUINE native-LR
    patches per scene, at cfg.lr_crop_size — the scientifically right
    real side for the cross-sensor task (standalone contract:
    `single_kernel/train.py:257-268`). Each scene's D sees its own LR
    pool; stacked along the same scene axis and sharded identically.
    A K=1 real_is_lr fleet matches a standalone real_is_lr run at
    seed+s; K>1 uses per-scene device-PRNG draws (the standalone
    trainer has no K>1 lr_pool mode — it samples lr_pool on host).

    Returns {"scene_names", "kernel_per_band" [S,C,kH,kW],
    "kernel_merged" [S,kH,kW], "state", "log_files"}.
    """
    s_total = len(pools)
    if s_total == 0:
        raise ValueError("train_fleet needs at least one pool")
    if cfg.real_is_lr:
        if lr_pools is None:
            raise ValueError(
                "real_is_lr=True needs lr_pools (one pool of native-LR "
                f"patches per scene at lr_crop_size={cfg.lr_crop_size})"
            )
        if len(lr_pools) != s_total:
            raise ValueError(
                f"lr_pools has {len(lr_pools)} pools for {s_total} scenes"
            )
        if lr_pools[0].patches.shape[-1] != cfg.lr_crop_size:
            raise ValueError(
                f"real_is_lr=True needs lr_pools patches at lr_crop_size="
                f"{cfg.lr_crop_size}, got {lr_pools[0].patches.shape[-1]}"
            )
    elif lr_pools is not None:
        raise ValueError("lr_pools given but cfg.real_is_lr is False")
    k_steps = cfg.steps_per_call
    if k_steps > 1:
        from .state import check_scan_intervals

        check_scan_intervals(
            cfg,
            {"iters": cfg.iters, "log_every": cfg.log_every,
             "kernel_log_every": cfg.kernel_log_every,
             "ckpt_every": cfg.ckpt_every},
            use_device_pool=True,  # the fleet pool is always HBM-resident
        )
    names = list(scene_names) if scene_names else [
        f"scene_{s:03d}" for s in range(s_total)
    ]
    if len(names) != s_total or len(set(names)) != s_total:
        raise ValueError("scene_names must be unique, one per pool")
    outdirs = [os.path.join(cfg.outdir, n) for n in names]
    for d in outdirs:
        os.makedirs(d, exist_ok=True)

    state = _stack_states(
        [init_training(dataclasses.replace(cfg, seed=cfg.seed + s))
         for s in range(s_total)]
    )
    stacked, sizes = _stack_pools(pools)
    lr_stacked, lr_sizes = (
        _stack_pools(lr_pools) if cfg.real_is_lr else (None, None)
    )

    ckpt_dir = os.path.join(cfg.outdir, "ckpt")
    state, start_iter = maybe_resume(cfg, state, ckpt_dir,
                                     announce=cfg.verbose)

    sizes_dev = jnp.asarray(np.asarray(sizes, np.int32))
    lr_sizes_dev = (
        jnp.asarray(np.asarray(lr_sizes, np.int32)) if cfg.real_is_lr
        else None
    )
    put = jnp.asarray
    lr_pool_dev = None
    if mesh is not None:
        axis = mesh.axis_names[0]
        n_dev = mesh.shape[axis]
        if s_total % n_dev:
            raise ValueError(
                f"{s_total} scenes not divisible over {n_dev} devices"
            )
        shard = NamedSharding(mesh, P(axis))
        # shard the stacked pool straight from host memory: staging it on
        # the default device first would bound fleet size by ONE chip's
        # HBM even when the sharded layout fits
        pool_dev = jax.device_put(stacked, shard)
        sizes_dev = jax.device_put(sizes_dev, shard)
        state = jax.device_put(state, shard)
        if cfg.real_is_lr:
            lr_pool_dev = jax.device_put(lr_stacked, shard)
            lr_sizes_dev = jax.device_put(lr_sizes_dev, shard)
        put = lambda a: jax.device_put(a, shard)  # noqa: E731
    else:
        pool_dev = jnp.asarray(stacked)
        if cfg.real_is_lr:
            lr_pool_dev = jnp.asarray(lr_stacked)

    s_local = s_total if mesh is None else s_total // mesh.shape[mesh.axis_names[0]]
    if scene_chunk is None:
        scene_chunk = pick_scene_chunk(cfg, s_local, stacked.shape[-1])
        if cfg.verbose and scene_chunk != s_local:
            print(f"[fleet] chain-mode residuals: dispatching "
                  f"{scene_chunk}/{s_local} scenes per chunk")
    elif s_local % scene_chunk:
        raise ValueError(
            f"scene_chunk {scene_chunk} must divide the per-device scene "
            f"count {s_local}"
        )

    if k_steps > 1:
        step_fn = make_fleet_chunk_step(cfg, mesh=mesh, s_local=s_local,
                                        scene_chunk=scene_chunk)
        host_rngs = None
    else:
        step_fn = make_fleet_step(cfg, mesh=mesh, s_local=s_local,
                                  scene_chunk=scene_chunk)
        # per-scene host RNG streams identical to a standalone run at seed+s
        host_rngs = [
            np.random.default_rng(cfg.seed + s + start_iter)
            for s in range(s_total)
        ]
    log_files = [os.path.join(d, "training_log.txt") for d in outdirs]
    if start_iter == 0:
        for f in log_files:
            with open(f, "w", encoding="utf-8") as fh:
                fh.write(LOG_HEADER)

    log_rows: list = []

    def flush():
        if not log_rows:
            return
        # one host sync per flush: materialize each buffered metric once;
        # leaves are [S] (K=1) or [S, K] (chunked) — normalize to [S, K]
        mats = []
        for i0, m in log_rows:
            leaves = {}
            for k in _LOG_KEYS:
                a = np.asarray(m[k])
                leaves[k] = a[:, None] if a.ndim == 1 else a
            mats.append((i0, leaves))
        for s, f in enumerate(log_files):
            with open(f, "a", encoding="utf-8") as fh:
                for i0, m in mats:
                    for j in range(m[_LOG_KEYS[0]].shape[1]):
                        fh.write(
                            f"{i0 + j},"
                            + ",".join(
                                f"{m[k][s, j]:.6f}" for k in _LOG_KEYS
                            )
                            + "\n"
                        )
        log_rows.clear()

    if k_steps > 1:
        # t iterates over the LAST iteration index of each K-step chunk
        iterator = range(start_iter + k_steps - 1, cfg.iters, k_steps)
    else:
        iterator = range(start_iter, cfg.iters)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc=f"Fleet[{s_total}]",
                            unit="chunk" if k_steps > 1 else "iter")
        except ImportError:
            pass

    metrics = None
    crop_sizes = lr_sizes if cfg.real_is_lr else sizes
    for t in iterator:
        if k_steps > 1:
            if cfg.real_is_lr:
                state, ms = step_fn(state, pool_dev, lr_pool_dev,
                                    sizes_dev, lr_sizes_dev)
            else:
                state, ms = step_fn(state, pool_dev, sizes_dev)
            log_rows.append((t + 2 - k_steps, ms))
            # per-scene values at the chunk's LAST iteration
            metrics = jax.tree_util.tree_map(lambda a: a[:, -1], ms)
        else:
            # same per-scene host-RNG draw order as a standalone run at
            # seed+s: hr indices from the HR pool size, crop indices from
            # the crop-source pool size (the LR pool under real_is_lr —
            # `PatchPool.sample`'s integers draw)
            hr_l, crop_l = [], []
            for s, r in enumerate(host_rngs):
                hr_l.append(r.integers(0, sizes[s], size=cfg.batch_size))
                crop_l.append(
                    r.integers(0, crop_sizes[s], size=cfg.batch_size))
            idx_args = (
                put(np.stack(hr_l).astype(np.int32)),
                put(np.stack(crop_l).astype(np.int32)),
            )
            if cfg.real_is_lr:
                state, metrics = step_fn(state, pool_dev, lr_pool_dev,
                                         *idx_args)
            else:
                state, metrics = step_fn(state, pool_dev, *idx_args)
            log_rows.append((t + 1, metrics))

        if (t + 1) % cfg.log_every == 0:
            flush()
            if progress and hasattr(iterator, "set_postfix"):
                iterator.set_postfix(
                    D=f"{float(np.mean(np.asarray(metrics['loss_D']))):.4f}",
                    G=f"{float(np.mean(np.asarray(metrics['loss_G_adv']))):.4f}",
                )

        if cfg.save_intermediate and (t + 1) % cfg.kernel_log_every == 0:
            ks = np.asarray(metrics["kernels"])  # [S, C, kH, kW]
            for s, d in enumerate(outdirs):
                np.save(os.path.join(d, f"kernel_iter{t + 1}.npy"),
                        ks[s].mean(axis=0))
                np.save(os.path.join(d, f"kernel_per_band_iter{t + 1}.npy"),
                        ks[s])

        if cfg.ckpt_every and (t + 1) % cfg.ckpt_every == 0:
            save_checkpoint(ckpt_dir, state, t + 1)

    flush()
    # extraction runs on the default device: G params are tiny, and the
    # vmapped composition's grouped conv cannot be GSPMD-partitioned
    # along the scene axis (same reason the step uses shard_map)
    g_params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a)), state.g_params
    )
    ks_final = np.asarray(jax.vmap(lambda p: extract_kernels(p))(
        g_params
    ))  # [S, C, kH, kW]
    merged = ks_final.mean(axis=1)
    for s, d in enumerate(outdirs):
        np.save(os.path.join(d, "kernel_per_band.npy"), ks_final[s])
        np.save(os.path.join(d, "kernel_merged.npy"), merged[s])
    return {
        "scene_names": names,
        "kernel_per_band": ks_final,
        "kernel_merged": merged,
        "state": state,
        "log_files": log_files,
    }
