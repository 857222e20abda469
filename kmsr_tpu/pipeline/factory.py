"""Stage: fused train-data factory — one device pass per batch of files.

The reference pipeline realizes hr/lr pair production as two file-mediated
stages (`C_30apply_kernel_to_landsat.py` writing `blurred` groups, then
`E_make_train_data.py` re-reading them and adding noise). This stage fuses
the whole degrade path on device — blur + x`factor` downsample + noise-pool
injection in ONE kernel launch per file batch (`ops.degrade_pallas`, XLA
fallback) — and writes the final `hr`/`lr` training files directly.

The two-stage route remains available (apply_kernel + make_train_data) for
drop-in reference-contract compatibility; this is the fast path.

Usage:
    python -m kmsr_tpu.pipeline.factory --input-dir DENOISED \
        --kernel kernel_per_band.npy --noise-pool pool.npy \
        --output-dir TRAIN [--factor 8] [--batch-size 128] [--seed 42] \
        [--backend pallas|xla]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampler import list_patch_files
from ..io.ncio import read_band_stack, read_nav
from ..io.schema import GROUP_DENOISED
from ..pipeline.apply_kernel import load_kernel
from ..pipeline.make_train_data import save_training_sample
from ..utils.profiling import stage_timer
from .common import DeviceSyncGuard, RunReport, sync_watch


def degrade_with_noise(
    batch: jax.Array, kernel: jax.Array, noise: jax.Array, factor: int, backend: str
) -> jax.Array:
    if backend == "auto":
        # the fused Mosaic kernel is ~5x the XLA strided conv on a TPU;
        # elsewhere interpret mode would be pathologically slow
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        import jax as _jax

        from ..ops.degrade_pallas import degrade_pallas

        # Mosaic kernels need a TPU; interpret elsewhere so the CLI contract
        # holds on CPU hosts (slow but correct).
        interp = _jax.default_backend() != "tpu"
        return degrade_pallas(batch, kernel, noise=noise, factor=factor, interpret=interp)
    from ..ops.degrade import degrade_strided

    return degrade_strided(batch, kernel, factor=factor) + noise


def load_moe_for_factory(moe_path: str):
    """Load a trained MoE degradation model for content-adaptive factory
    runs. moe_path: a dir holding `moe_model.npz` (this framework, with
    optional `moe_state.npz` BN stats), that .npz itself, or the
    reference's torch `moe_model.pth`. Returns (params, state, eval_mode):
    eval_mode is True when BN running stats were found (batch-independent
    selection); otherwise selection falls back to batch statistics."""
    from ..models.moe import MoEConfig, init_moe

    if moe_path.endswith(".pth"):
        from ..utils.torch_import import load_moe_torch_checkpoint

        params, state = load_moe_torch_checkpoint(moe_path, cfg=None)
        return params, state, True
    npz = (
        moe_path if moe_path.endswith(".npz")
        else os.path.join(moe_path, "moe_model.npz")
    )
    data = np.load(npz)
    bank = None
    for k in data.files:
        if k.startswith("name_") and "kernel_bank" in str(data[k]):
            bank = data["arr_" + k[len("name_"):]]
    if bank is None:
        raise ValueError(f"{npz} has no kernel_bank leaf — not a MoE model")
    cfg = MoEConfig(
        n_kernels=bank.shape[0],
        n_channels=bank.shape[1],
        kernel_size=bank.shape[2],
    )
    from ..utils.params_io import load_params

    template, state0 = init_moe(jax.random.PRNGKey(0), cfg)
    params = load_params(npz, template)
    state_path = os.path.join(os.path.dirname(npz), "moe_state.npz")
    if os.path.exists(state_path):
        return params, load_params(state_path, state0), True
    return params, state0, False


def _npy_split_batches(files, batch_size, shape, factor):
    """Yield (paths, presplit_batch, natural_batch, fails) per chunk via
    the native loader's DUAL split gather — one file read per patch fills
    both the HALO-FREE [C, f, H/f, W, B] device layout
    (`degrade_pallas_presplit(baked_halo=False)`'s input: natural byte
    count, measured faster on chip than the baked-halo variant; the
    layout work costs the host nothing extra, it is just a write order)
    and the natural [B, C, H, W] batch (the hr group to be written) —
    with double-buffered prefetch. Falls back to numpy load + host
    transpose (per-file isolation) when no toolchain is available or the
    loader errors."""
    c, h, w = shape
    idx_chunks = [
        np.arange(i, min(i + batch_size, len(files)), dtype=np.int64)
        for i in range(0, len(files), batch_size)
    ]
    loader = None
    try:
        from ..runtime import NativePatchLoader

        loader = NativePatchLoader(files, shape=shape)
    except Exception:
        pass  # numpy fallback below

    def np_split(idx):
        """Per-file-isolated numpy fallback."""
        good, stacks, fails = [], [], []
        for i in idx:
            try:
                a = np.load(files[i])
                if a.shape != shape:
                    raise ValueError(f"shape {a.shape} != {shape}")
                stacks.append(np.asarray(a, np.float32))
                good.append(files[i])
            except Exception as e:
                fails.append((files[i], str(e)))
        if not stacks:
            return good, None, None, fails
        nat = np.stack(stacks, axis=0)  # [B, C, H, W]
        x = np.moveaxis(nat, 0, -1)     # [C, H, W, B]
        oh = h // factor
        xr = x.reshape(c, oh, factor, w // factor, factor, len(good))
        xp = np.transpose(xr, (0, 2, 1, 4, 3, 5)).reshape(
            c, factor, oh, w, len(good)
        )
        return good, xp, nat, fails

    def enqueue(k):
        nonlocal loader
        try:
            loader.prefetch_split_dual(idx_chunks[k], factor=factor,
                                       halo=False)
        except Exception:
            loader.close()  # loader unusable: numpy path from here on
            loader = None

    try:
        if loader is not None:
            enqueue(0)
        for k, idx in enumerate(idx_chunks):
            bufs = None
            if loader is not None:
                try:
                    bufs = loader.wait()
                except Exception:
                    bufs = None  # re-read the chunk with per-file isolation
                if loader is not None and k + 1 < len(idx_chunks):
                    enqueue(k + 1)
            if bufs is not None:
                yield [files[i] for i in idx], bufs[0], bufs[1], []
            else:
                yield np_split(idx)
    finally:
        if loader is not None:
            loader.close()


def scene_seed(seed: int, scene: str) -> int:
    """Derived noise seed for one scene of a per-scene (--kernel-root)
    factory run: stable across runs AND across scene-set changes (the
    scene NAME is mixed in, not its position)."""
    import zlib

    return (seed ^ zlib.crc32(scene.encode("utf-8"))) & 0x7FFFFFFF


def run_factory(
    input_dir: str,
    kernel_path: str | None,
    noise_pool_path: str,
    output_dir: str,
    factor: int = 8,
    in_group: str = GROUP_DENOISED,
    batch_size: int = 128,  # LANE multiple: the Pallas routes pad each
    # chunk's batch axis to 128 lanes — a 64 default would run every
    # Mosaic dispatch on 50% zero lanes
    seed: int = 42,
    backend: str = "auto",
    progress: bool = True,
    moe_path: str | None = None,
    moe_noise: str = "pool",
    input_format: str = "auto",
    kernel_root: str | None = None,
    files: list[str] | None = None,
) -> RunReport:
    """moe_path switches the factory to content-adaptive mode: each HR
    patch is routed by the trained SelectorNet to its expert kernel
    (argmax — the trained regime's hard low-temperature selection) and
    degraded with THAT kernel, instead of the reference C_31 behavior of
    collapsing the bank to one batch-mean kernel. moe_noise: 'pool'
    keeps the empirical noise-pool injection (E_ semantics); 'sigma'
    uses the expert's learned per-band Gaussian sigma instead.

    input_format: 'nc' (reference E_ contract: grouped NetCDF patches),
    'npy' (raw [C, H, W] float32 patch dirs, the `cut --format npy` /
    A_01 GOCI output — the reference has no factory route for these),
    or 'auto' (npy iff the dir holds .npy files and no .nc). The npy
    single-kernel Pallas route streams batches through the native
    loader's SPLIT gather straight into `degrade_pallas_presplit` — the
    host assembles the phase-split layout for free (write order), so
    the device pass is the pure tap lattice."""
    t0 = time.time()
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if sum(p is not None for p in (kernel_path, moe_path, kernel_root)) != 1:
        raise ValueError(
            "exactly one of kernel_path / moe_path / kernel_root is required"
        )
    if input_format == "auto":
        import glob as _glob

        has_npy = bool(_glob.glob(os.path.join(input_dir, "*.npy")))
        has_nc = bool(_glob.glob(os.path.join(input_dir, "*.nc")))
        input_format = "npy" if has_npy and not has_nc else "nc"
    if input_format not in ("nc", "npy"):
        raise ValueError(f"input_format must be auto|nc|npy, got {input_format!r}")
    if files is None:
        files = list_patch_files(
            input_dir, "*.npy" if input_format == "npy" else "*.nc"
        )

    if kernel_root is not None:
        # per-scene kernels (reference workflow: one KernelGAN per scene,
        # `single_kernel/train.py` run once per scene — the fleet trainer's
        # outdir layout): each scene's files run through ITS kernel
        from .common import route_per_scene_kernels

        return route_per_scene_kernels(
            files, kernel_root,
            lambda scene, k_path, scene_files: run_factory(
                input_dir, k_path, noise_pool_path, output_dir,
                factor=factor, in_group=in_group, batch_size=batch_size,
                # distinct per-scene noise stream: with a shared seed every
                # scene's i-th file would draw the SAME noise-pool entry
                seed=scene_seed(seed, scene), backend=backend,
                progress=progress, moe_noise=moe_noise,
                input_format=input_format, files=scene_files,
            ),
            "factory", output_dir,
        )
    pool = np.load(noise_pool_path).astype(np.float32)  # [N, C, h, w]
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    # noise indices are drawn per FILE up front (position-indexed), so
    # every route/backend/chunking — and per-file failures — produces the
    # same lr for the same seed (per-chunk draws desynced the presplit
    # and natural routes, and shifted every draw after a failed file)
    noise_idx_all = rng.integers(0, pool.shape[0], size=len(files))
    file_pos = {p: i for i, p in enumerate(files)}
    base_key = jax.random.PRNGKey(seed)

    if moe_path is None:
        kernel = jnp.asarray(load_kernel(kernel_path))
        fn = jax.jit(
            lambda b, n, key: (
                degrade_with_noise(b, kernel, n, factor, backend),
                jnp.zeros((b.shape[0],), jnp.int32),
            )
        )
    else:
        from ..models.moe import (
            effective_kernels, effective_sigmas, selector_forward,
        )
        from ..ops.degrade import degrade_batch_kernels

        m_params, m_state, eval_mode = load_moe_for_factory(moe_path)
        banks = effective_kernels(m_params)    # [K, C, kh, kw]
        sigmas = effective_sigmas(m_params)    # [K, C]

        def moe_fn(b, n, key):
            # eval-mode BN when running stats were saved; else batch stats
            logits, _ = selector_forward(
                m_params["selector"], m_state["selector"], b,
                train=not eval_mode,
            )
            experts = jnp.argmax(logits, axis=-1)          # [B]
            bk = jnp.take(banks, experts, axis=0)          # [B, C, kh, kw]
            out = degrade_batch_kernels(
                b, bk, factor=factor, decimate=False, padding="replicate"
            )
            if moe_noise == "sigma":
                sig = jnp.take(sigmas, experts, axis=0)    # [B, C]
                n = jax.random.normal(key, out.shape) * sig[:, :, None, None]
            return out + n, experts

        fn = jax.jit(moe_fn)

    ok, fail = [], []

    use_presplit = (
        input_format == "npy" and moe_path is None and backend == "pallas"
        # presplit kernel supports composed spans (kh + f - 1) <= 5f (the
        # |q| <= 2 extended tap lattice); the baked_halo=False layout used
        # here is span-agnostic, so no halo-depth coupling to check
        and kernel.shape[-1] + factor - 1 <= 5 * factor
        and bool(files)
    )
    shape = None
    if use_presplit:
        try:
            shape = tuple(np.load(files[0], mmap_mode="r").shape)
        except Exception:
            # unreadable probe file: fall through to the generic route,
            # whose chunked_reader isolates it per file instead of
            # aborting the whole run
            use_presplit = False
    if use_presplit:
        # streaming presplit route: native split gather feeds the
        # permutation-free kernel; see the docstring
        from ..ops.degrade_pallas import LANE, degrade_pallas_presplit

        interp = jax.default_backend() != "tpu"
        if len(shape) != 3 or shape[1] % factor or shape[2] % factor:
            raise ValueError(
                f"npy patches must be [C, H, W] with H, W multiples of "
                f"factor; got {shape}"
            )
        # batch DP: shard the lane (batch) axis over all local devices —
        # the degrade is embarrassingly parallel, so a pod chip-set
        # multiplies factory throughput with no communication
        devs = jax.local_devices()  # per-host stage: files are host-sharded
        lane_quantum = LANE * len(devs)
        degrade_fn = degrade_pallas_presplit
        if len(devs) > 1:
            from ..parallel.compat import VMA_KW as vma_kw, shard_map
            from jax.sharding import Mesh, PartitionSpec as P

            mesh = Mesh(np.array(devs), ("data",))
            degrade_fn = shard_map(
                lambda a, k, noise: degrade_pallas_presplit(
                    a, k, noise=noise, factor=factor, interpret=interp,
                    baked_halo=False,
                ),
                mesh=mesh,
                in_specs=(
                    P(None, None, None, None, "data"),
                    P(None, None, None),
                    P(None, None, None, "data"),
                ),
                out_specs=P(None, None, None, "data"),
                **vma_kw,
            )
        batches = _npy_split_batches(files, batch_size, shape, factor)
        if progress:
            try:
                from tqdm import tqdm

                batches = tqdm(
                    batches, desc="factory", unit="batch",
                    total=-(-len(files) // batch_size),
                )
            except ImportError:
                pass
        sync_guard = DeviceSyncGuard()

        def _writeback(paths, nat, b, lr_dev):
            # np.asarray is the sync point — materializing batch k here,
            # after batch k+1 was dispatched, overlaps device compute +
            # D2H with the host-side zlib .nc writes (one-deep pipeline).
            # Async dispatch also means device-side runtime failures
            # surface here — fail the batch's files, don't crash the run
            # (unless the guard sees the device persistently wedged).
            try:
                with stage_timer("factory.device_sync"), sync_watch("factory"):
                    lr_batch = np.transpose(
                        np.asarray(lr_dev), (3, 0, 1, 2))[:b]
                sync_guard.succeeded()
            except Exception as e:  # per-batch failure isolation
                fail.extend((p, f"{type(e).__name__}: {e}") for p in paths)
                sync_guard.failed(e)
                return
            with stage_timer("factory.host_write"):
                for path, hr, lr in zip(paths, nat, lr_batch):
                    try:
                        base = os.path.splitext(
                            os.path.basename(path))[0]
                        out_path = os.path.join(
                            output_dir, f"{base}_train.nc")
                        save_training_sample(out_path, hr, lr, None)
                        ok.append(out_path)
                    except Exception as e:
                        fail.append((path, str(e)))

        pending = None
        for paths, xp, nat, chunk_fail in batches:
            fail.extend(chunk_fail)
            if xp is None:
                continue
            b = xp.shape[-1]
            noise_idx = noise_idx_all[[file_pos[p] for p in paths]]
            noise = np.transpose(pool[noise_idx], (1, 2, 3, 0))  # CHWB
            # DP only pays when the chunk roughly fills the device set;
            # tiny/tail chunks run single-device (same wall time, no
            # lane_quantum padding blow-up)
            use_dp = len(devs) > 1 and b >= lane_quantum // 2
            quantum = lane_quantum if use_dp else LANE
            b_pad = -(-b // quantum) * quantum
            if b_pad != b:
                xp = np.pad(xp, [(0, 0)] * 4 + [(0, b_pad - b)])
                noise = np.pad(noise, [(0, 0)] * 3 + [(0, b_pad - b)])
            if use_dp:
                lr_dev = degrade_fn(
                    jnp.asarray(xp), kernel, jnp.asarray(noise)
                )
            else:
                lr_dev = degrade_pallas_presplit(
                    jnp.asarray(xp), kernel, noise=jnp.asarray(noise),
                    factor=factor, interpret=interp, baked_halo=False,
                )
            if pending is not None:
                _writeback(*pending)
            pending = (paths, nat, b, lr_dev)
        if pending is not None:
            _writeback(*pending)
        report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
        print(f"factory[pallas-presplit]: {report.summary()} -> {output_dir}")
        return report

    from .common import chunked_reader

    def _read(p):
        if input_format == "npy":
            a = np.asarray(np.load(p), np.float32)
            if a.ndim != 3:
                raise ValueError(f"npy patch must be [C, H, W], got {a.shape}")
            return a
        return read_band_stack(p, in_group)

    reader = chunked_reader(files, batch_size, _read,
                            timer="factory.host_read_bg")
    if progress:
        try:
            from tqdm import tqdm

            reader = tqdm(
                reader, desc="factory", unit="batch",
                total=-(-len(files) // batch_size),
            )
        except ImportError:
            pass
    sync_guard = DeviceSyncGuard()

    def _writeback(valid, hr_batch, lr_dev, experts_dev):
        # np.asarray syncs batch k AFTER batch k+1 was dispatched: device
        # compute + D2H overlap the host-side nav reads and zlib .nc
        # writes. Device-side runtime failures surface at this sync (async
        # dispatch) — fail this batch's files, don't crash the run
        # (unless the guard sees the device persistently wedged).
        try:
            with stage_timer("factory.device_sync"), sync_watch("factory"):
                lr_batch = np.asarray(lr_dev)
                experts = np.asarray(experts_dev)
            sync_guard.succeeded()
        except Exception as e:  # per-batch failure isolation
            fail.extend((p, f"{type(e).__name__}: {e}") for p in valid)
            sync_guard.failed(e)
            return
        with stage_timer("factory.host_write"):
            for path, hr, lr, expert in zip(valid, hr_batch, lr_batch, experts):
                try:
                    base = os.path.splitext(os.path.basename(path))[0]
                    out_path = os.path.join(output_dir, f"{base}_train.nc")
                    nav = read_nav(path) if input_format == "nc" else None
                    save_training_sample(
                        out_path, hr, lr, nav or None,
                        lr_attrs=(
                            {"moe_expert": int(expert)}  # selection provenance
                            if moe_path is not None else None
                        ),
                    )
                    ok.append(out_path)
                except Exception as e:
                    fail.append((path, str(e)))

    pending = None
    for valid, stacks, chunk_fail in reader:
        fail.extend(chunk_fail)
        if not stacks:
            continue
        hr_batch = np.stack(stacks, axis=0)
        noise_idx = noise_idx_all[[file_pos[p] for p in valid]]
        # H2D + enqueue. Attribution (bench_pipeline r5): this scope is
        # the factory's bulk (61.8 s of 75.3 s on a healthy tunnel) —
        # transfer-bound, not compute-bound. Measured-and-rejected: a
        # background uploader thread doing jnp.asarray(hr_batch) moves
        # only ~1.5 s here — H2D is ASYNC on this backend and the copy
        # realizes at dispatch regardless of which thread created the
        # array (docs/NOTES_r5.md).
        with stage_timer("factory.dispatch"):
            noise = jnp.asarray(pool[noise_idx])
            # chunking-independent key: fold the chunk's first file
            # position into the seed key (only consumed by --moe-noise
            # sigma)
            key = jax.random.fold_in(base_key, file_pos[valid[0]])
            lr_dev, experts_dev = fn(jnp.asarray(hr_batch), noise, key)
        if pending is not None:
            _writeback(*pending)
        pending = (valid, hr_batch, lr_dev, experts_dev)
    if pending is not None:
        _writeback(*pending)
    report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
    print(f"factory[{backend}]: {report.summary()} -> {output_dir}")
    return report


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Fused hr/lr train-data factory")
    p.add_argument("--input-dir", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--kernel", help="single per-band kernel .npy")
    src.add_argument("--moe", help="content-adaptive mode: MoE model dir / "
                                   "moe_model.npz / reference moe_model.pth — "
                                   "each patch degrades with its selector-"
                                   "routed expert kernel")
    src.add_argument("--kernel-root",
                     help="per-scene kernels: a fleet-trainer outdir "
                          "(<scene>/kernel_per_band.npy); each patch "
                          "degrades with ITS scene's kernel")
    p.add_argument("--moe-noise", choices=["pool", "sigma"], default="pool",
                   help="pool: empirical noise-pool sample (E_ semantics); "
                        "sigma: the expert's learned per-band Gaussian")
    p.add_argument("--noise-pool", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--in-group", default=GROUP_DENOISED)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--backend", choices=["auto", "xla", "pallas"], default="auto")
    p.add_argument("--input-format", choices=["auto", "nc", "npy"],
                   default="auto",
                   help="npy: raw [C,H,W] patch dirs (cut --format npy / "
                        "A_01 output) — streamed through the native split "
                        "loader into the presplit kernel on the Pallas path")
    a = p.parse_args(argv)
    report = run_factory(
        a.input_dir, a.kernel, a.noise_pool, a.output_dir,
        factor=a.factor, in_group=a.in_group, batch_size=a.batch_size,
        seed=a.seed, backend=a.backend, moe_path=a.moe, moe_noise=a.moe_noise,
        input_format=a.input_format, kernel_root=a.kernel_root,
    )
    return 0 if report.n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
