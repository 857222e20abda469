"""Stage: apply a learned blur kernel + downsample to a patch folder.

Contract parity with `C_30apply_kernel_to_landsat.py:127-213` (single
kernel, reads `denoised`, appends a `blurred` group to a copied file) and
`C_31apply_muti_kernel_to_landsat.py` (batch kernels [B,C,kH,kW] are
averaged over B; reads `hr`, writes `lr` — both selectable here via
--in-group/--out-group).

TPU-first: files are stacked into device batches and degraded with the
fused strided depthwise conv (`ops.degrade.degrade_strided`) — one XLA
launch per batch of files instead of one conv per file.

Usage:
    python -m kmsr_tpu.pipeline.apply_kernel --input-dir PATCHES \
        --kernel kernel_per_band.npy --output-dir OUT \
        [--factor 8] [--in-group denoised] [--out-group blurred] \
        [--suffix _blurred] [--batch-size 64]
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..data.sampler import list_patch_files
from ..io.ncio import copy_file_with_groups, read_band_stack, write_band_stack
from ..io.schema import GROUP_BLURRED, GROUP_DENOISED, RADIANCE_UNITS
from ..ops.degrade import degrade_strided
from .common import DeviceSyncGuard, RunReport


def load_kernel(kernel_path: str, n_bands: int = 5) -> np.ndarray:
    """Load a kernel artifact: [kH,kW] broadcasts to all bands; [C,kH,kW]
    used per band; [B,C,kH,kW] batch kernels are mean-reduced over B
    (parity: `C_31...py:27-29`)."""
    k = np.load(kernel_path).astype(np.float32)
    if k.ndim == 4:
        k = k.mean(axis=0)
    if k.ndim == 2:
        k = np.broadcast_to(k[None], (n_bands, *k.shape)).copy()
    if k.ndim != 3 or k.shape[0] != n_bands:
        raise ValueError(f"kernel shape {k.shape} incompatible with {n_bands} bands")
    sums = k.sum(axis=(1, 2))
    if not np.isfinite(k).all() or (np.abs(sums) <= 1e-6).any():
        # a degenerate band (all-zero after the extractor's clamp, or
        # NaN) would silently degrade that band to pure noise in every
        # produced pair — caught live in r5 when a collapsed GAN's band-2
        # kernel zeroed the lr side (bilinear 13 dB). Fail the artifact
        # loudly at the factory boundary instead (per-scene failure
        # isolation takes it from there).
        raise ValueError(
            f"degenerate kernel {kernel_path}: band sums {sums.tolist()} "
            f"(finite={bool(np.isfinite(k).all())}) — at least one band "
            f"is all-zero/NaN; the producing run is collapsed"
        )
    return k


def apply_kernel_to_folder(
    input_dir: str,
    kernel_path: str | None,
    output_dir: str,
    factor: int = 8,
    in_group: str = GROUP_DENOISED,
    out_group: str = GROUP_BLURRED,
    suffix: str = "_blurred",
    batch_size: int = 64,
    in_place: bool = False,
    progress: bool = True,
    moe_path: str | None = None,
    kernel_root: str | None = None,
    files: list[str] | None = None,
) -> RunReport:
    """Degrade every patch file; write `out_group` into a copy (or in place).

    moe_path switches to content-adaptive routing: each patch is routed
    by the trained SelectorNet to its expert kernel and blurred with THAT
    kernel (same behavior and `moe_expert` provenance attr as the fused
    factory's --moe mode), instead of the reference C_31 semantics of
    collapsing batch kernels to their mean. The two routes (this stage +
    make_train_data vs the fused factory) then produce the same data."""
    import time

    import jax

    t0 = time.time()
    if sum(p is not None for p in (kernel_path, moe_path, kernel_root)) != 1:
        raise ValueError(
            "exactly one of kernel_path / moe_path / kernel_root is required"
        )
    if files is None:
        files = list_patch_files(input_dir, "*.nc")

    if kernel_root is not None:
        # per-scene kernels (fleet-trainer outdir layout); mirrors the
        # fused factory's --kernel-root semantics, see factory.run_factory
        from .common import route_per_scene_kernels

        return route_per_scene_kernels(
            files, kernel_root,
            lambda scene, k_path, scene_files: apply_kernel_to_folder(
                input_dir, k_path, output_dir, factor=factor,
                in_group=in_group, out_group=out_group, suffix=suffix,
                batch_size=batch_size, in_place=in_place, progress=progress,
                files=scene_files,
            ),
            "apply_kernel", output_dir,
        )
    # batch DP (single-kernel route only): the degrade is per-sample
    # independent, so the batch axis shards over all local devices and
    # GSPMD partitions the conv with no communication. The MoE route
    # stays single-device: its selector may use batch statistics (no
    # saved BN stats), which lane padding would perturb.
    from .common import local_batch_dp, pad_put

    sharding, n_dev = (None, 1) if moe_path is not None else local_batch_dp()
    if moe_path is None:
        kernel = jnp.asarray(load_kernel(kernel_path))
        fn = jax.jit(
            lambda b: (
                degrade_strided(b, kernel, factor=factor),
                jnp.full((b.shape[0],), -1, jnp.int32),
            )
        )
        kernel_src = os.path.basename(kernel_path)
    else:
        from ..models.moe import effective_kernels, selector_forward
        from ..ops.degrade import degrade_batch_kernels
        from .factory import load_moe_for_factory

        m_params, m_state, eval_mode = load_moe_for_factory(moe_path)
        banks = effective_kernels(m_params)  # [K, C, kh, kw]

        def moe_fn(b):
            logits, _ = selector_forward(
                m_params["selector"], m_state["selector"], b,
                train=not eval_mode,
            )
            experts = jnp.argmax(logits, axis=-1)  # [B]
            bk = jnp.take(banks, experts, axis=0)  # [B, C, kh, kw]
            out = degrade_batch_kernels(
                b, bk, factor=factor, decimate=False, padding="replicate"
            )
            return out, experts

        fn = jax.jit(moe_fn)
        kernel_src = os.path.basename(os.path.normpath(moe_path))
    os.makedirs(output_dir, exist_ok=True)

    ok, fail = [], []
    from .common import chunked_reader

    reader = chunked_reader(files, batch_size, lambda p: read_band_stack(p, in_group))
    if progress:
        try:
            from tqdm import tqdm

            reader = tqdm(
                reader, desc="applying kernel", unit="batch",
                total=-(-len(files) // batch_size),
            )
        except ImportError:
            pass

    sync_guard = DeviceSyncGuard()

    def _writeback(valid, b, degraded_dev, experts_dev):
        # sync batch k after batch k+1 was dispatched: device compute +
        # D2H overlap the host-side file copies and .nc writes. JAX
        # dispatch is async, so a device-side runtime failure surfaces
        # HERE (not at fn(batch)) — catch it and fail this group's files
        # instead of crashing the whole run (unless the guard sees the
        # device is persistently wedged, in which case abort loudly).
        try:
            degraded = np.asarray(degraded_dev)[:b]
            experts = np.asarray(experts_dev)[:b]
            sync_guard.succeeded()
        except Exception as e:  # per-group failure isolation
            fail.extend((p, f"{type(e).__name__}: {e}") for p in valid)
            sync_guard.failed(e)
            return
        for path, lr, expert in zip(valid, degraded, experts):
            try:
                base = os.path.splitext(os.path.basename(path))[0]
                if in_place:
                    out_path = path
                else:
                    out_path = os.path.join(output_dir, f"{base}{suffix}.nc")
                    copy_file_with_groups(path, out_path)
                write_band_stack(
                    out_path,
                    out_group,
                    lr,
                    dims=(f"y_{out_group}", f"x_{out_group}"),
                    mode="a",
                    var_attrs={"units": RADIANCE_UNITS},
                    group_attrs={
                        "history": f"blur kernel applied, {factor}x downsampled",
                        "kernel_file": kernel_src,
                        **({"moe_expert": int(expert)} if moe_path else {}),
                    },
                )
                ok.append(out_path)
            except Exception as e:
                fail.append((path, str(e)))

    pending = None
    for valid, stacks, chunk_fail in reader:
        fail.extend(chunk_fail)
        if not stacks:
            continue
        # group the chunk by shape: one mixed-size file must fail (or run
        # in its own group), not crash the whole run at np.stack
        groups: dict = {}
        for p, s in zip(valid, stacks):
            groups.setdefault(s.shape, []).append((p, s))
        for items in groups.values():
            paths = [p for p, _ in items]
            try:
                batch, b = pad_put(
                    np.stack([s for _, s in items]), sharding, n_dev
                )
                degraded_dev, experts_dev = fn(batch)
            except Exception as e:  # per-group failure isolation
                fail.extend((p, f"{type(e).__name__}: {e}") for p in paths)
                continue
            if pending is not None:
                _writeback(*pending)
            pending = (paths, b, degraded_dev, experts_dev)
    if pending is not None:
        _writeback(*pending)
    report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
    print(f"apply_kernel: {report.summary()} -> {output_dir}")
    return report


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Apply blur kernel + downsample")
    p.add_argument("--input-dir", required=True)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--kernel", help="kernel .npy ([kH,kW], [C,kH,kW] or [B,C,kH,kW] batch-mean)")
    src.add_argument("--moe", help="content-adaptive mode: MoE model dir / .npz / reference .pth")
    src.add_argument("--kernel-root",
                     help="per-scene kernels: a fleet-trainer outdir "
                          "(<scene>/kernel_per_band.npy)")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--in-group", default=GROUP_DENOISED)
    p.add_argument("--out-group", default=GROUP_BLURRED)
    p.add_argument("--suffix", default="_blurred")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--in-place", action="store_true")
    return p


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    a = build_parser().parse_args(argv)
    report = apply_kernel_to_folder(
        a.input_dir,
        a.kernel,
        a.output_dir,
        factor=a.factor,
        in_group=a.in_group,
        out_group=a.out_group,
        suffix=a.suffix,
        batch_size=a.batch_size,
        in_place=a.in_place,
        moe_path=a.moe,
        kernel_root=a.kernel_root,
    )
    return 0 if report.n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
