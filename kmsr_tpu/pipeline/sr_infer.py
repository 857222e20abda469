"""Stage: SR inference over a folder of .nc files (framework extension).

Reads the `lr` group of each file (batched over files), runs the SR CNN
in bf16, writes an `sr` group, and — when an `hr` group is present —
reports PSNR/SSIM against it (the BASELINE parity harness).

Usage:
    python -m kmsr_tpu.pipeline.sr_infer --input-dir TRAIN_DATA \
        --model sr_model.npz --output-dir OUT [--factor 8] [--batch-size 32]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampler import list_patch_files
from ..io.ncio import NCFile, copy_file_with_groups, read_band_stack, write_band_stack
from ..io.schema import GROUP_HR, GROUP_LR
from ..models.sr import SRConfig, init_sr, sr_forward
from ..ops.metrics import psnr, ssim
from ..utils.params_io import load_params
from .common import DeviceSyncGuard, RunReport


def load_sr_model(model_path: str, cfg: SRConfig) -> dict:
    template = init_sr(jax.random.PRNGKey(0), cfg)
    return load_params(model_path, template)


def sr_infer_folder(
    input_dir: str,
    model_path: str,
    output_dir: str,
    cfg: SRConfig = SRConfig(),
    in_group: str = GROUP_LR,
    ref_group: str = GROUP_HR,
    batch_size: int = 32,
    progress: bool = True,
) -> RunReport:
    t0 = time.time()
    params = load_sr_model(model_path, cfg)
    files = list_patch_files(input_dir, "*.nc")
    os.makedirs(output_dir, exist_ok=True)
    fwd = jax.jit(lambda p, x: sr_forward(p, x, cfg))
    # batch DP: the SR forward has no cross-sample state (pure convs),
    # so the file batch shards over all local devices via GSPMD
    from .common import local_batch_dp, pad_put

    sharding, n_dev = local_batch_dp()

    ok, fail, metrics = [], [], []
    from .common import chunked_reader

    reader = chunked_reader(files, batch_size, lambda p: read_band_stack(p, in_group))
    if progress:
        try:
            from tqdm import tqdm

            reader = tqdm(
                reader, desc="SR inference", unit="batch",
                total=-(-len(files) // batch_size),
            )
        except ImportError:
            pass
    sync_guard = DeviceSyncGuard()

    def _writeback(valid, b, preds_dev):
        # sync batch k after batch k+1 was dispatched: the SR forward +
        # D2H overlap host file copies, .nc writes and PSNR/SSIM evals.
        # Async dispatch means device-side runtime failures surface at
        # this materialization — fail the group, don't crash the run
        # (unless the guard sees the device is persistently wedged).
        try:
            preds = np.asarray(preds_dev)[:b]
            sync_guard.succeeded()
        except Exception as e:  # per-group failure isolation
            fail.extend((p, f"{type(e).__name__}: {e}") for p in valid)
            sync_guard.failed(e)
            return
        for path, pred in zip(valid, preds):
            try:
                base = os.path.splitext(os.path.basename(path))[0]
                out_path = os.path.join(output_dir, f"{base}_sr.nc")
                copy_file_with_groups(path, out_path)
                write_band_stack(
                    out_path, "sr", pred, dims=("y_sr", "x_sr"), mode="a",
                    group_attrs={"model_file": os.path.basename(model_path),
                                 "factor": cfg.factor},
                )
                with NCFile(out_path, "r") as f:
                    has_ref = f.has_group(ref_group)
                if has_ref:
                    hr = read_band_stack(path, ref_group)
                    dr = float(np.nanmax(hr) - np.nanmin(hr)) or 1.0
                    metrics.append(
                        (
                            float(psnr(jnp.asarray(pred), jnp.asarray(hr), dr)),
                            float(ssim(jnp.asarray(pred), jnp.asarray(hr), dr)),
                        )
                    )
                ok.append(out_path)
            except Exception as e:
                fail.append((path, str(e)))

    pending = None
    for valid, stacks, chunk_fail in reader:
        fail.extend(chunk_fail)
        if not stacks:
            continue
        # per-shape groups: mixed-size inputs must not kill the run
        groups: dict = {}
        for p, s in zip(valid, stacks):
            groups.setdefault(s.shape, []).append((p, s))
        for items in groups.values():
            paths = [p for p, _ in items]
            try:
                batch, b = pad_put(
                    np.stack([s for _, s in items]), sharding, n_dev
                )
                preds_dev = fwd(params, batch)
            except Exception as e:  # per-group failure isolation
                fail.extend((p, f"{type(e).__name__}: {e}") for p in paths)
                continue
            if pending is not None:
                _writeback(*pending)
            pending = (paths, b, preds_dev)
    if pending is not None:
        _writeback(*pending)
    report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
    msg = f"sr_infer: {report.summary()} -> {output_dir}"
    if metrics:
        arr = np.asarray(metrics)
        msg += f" | PSNR {arr[:,0].mean():.2f} dB, SSIM {arr[:,1].mean():.4f}"
    print(msg)
    return report


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="SR inference over .nc folder")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--n-blocks", type=int, default=8)
    p.add_argument(
        "--upsampler", choices=["progressive", "oneshot"], default="progressive"
    )
    p.add_argument("--in-group", default=GROUP_LR)
    p.add_argument("--ref-group", default=GROUP_HR)
    p.add_argument("--batch-size", type=int, default=128)
    a = p.parse_args(argv)
    cfg = SRConfig(
        width=a.width, n_blocks=a.n_blocks, factor=a.factor, upsampler=a.upsampler
    )
    report = sr_infer_folder(
        a.input_dir, a.model, a.output_dir, cfg,
        in_group=a.in_group, ref_group=a.ref_group, batch_size=a.batch_size,
    )
    return 0 if report.n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
