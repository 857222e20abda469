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
        --output-dir TRAIN [--factor 8] [--batch-size 64] [--seed 42] \
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
from .common import RunReport


def degrade_with_noise(
    batch: jax.Array, kernel: jax.Array, noise: jax.Array, factor: int, backend: str
) -> jax.Array:
    if backend == "pallas":
        import jax as _jax

        from ..ops.degrade_pallas import degrade_pallas

        # Mosaic kernels need a TPU; interpret elsewhere so the CLI contract
        # holds on CPU hosts (slow but correct).
        interp = _jax.default_backend() != "tpu"
        return degrade_pallas(batch, kernel, noise=noise, factor=factor, interpret=interp)
    from ..ops.degrade import degrade_strided

    return degrade_strided(batch, kernel, factor=factor) + noise


def run_factory(
    input_dir: str,
    kernel_path: str,
    noise_pool_path: str,
    output_dir: str,
    factor: int = 8,
    in_group: str = GROUP_DENOISED,
    batch_size: int = 64,
    seed: int = 42,
    backend: str = "xla",
    progress: bool = True,
) -> RunReport:
    t0 = time.time()
    kernel = jnp.asarray(load_kernel(kernel_path))
    pool = np.load(noise_pool_path).astype(np.float32)  # [N, C, h, w]
    files = list_patch_files(input_dir, "*.nc")
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    fn = jax.jit(
        lambda b, n: degrade_with_noise(b, kernel, n, factor, backend)
    )

    ok, fail = [], []
    from .common import chunked_reader

    reader = chunked_reader(files, batch_size, lambda p: read_band_stack(p, in_group))
    if progress:
        try:
            from tqdm import tqdm

            reader = tqdm(
                reader, desc="factory", unit="batch",
                total=-(-len(files) // batch_size),
            )
        except ImportError:
            pass
    for valid, stacks, chunk_fail in reader:
        fail.extend(chunk_fail)
        if not stacks:
            continue
        hr_batch = np.stack(stacks, axis=0)
        noise_idx = rng.integers(0, pool.shape[0], size=len(valid))
        noise = jnp.asarray(pool[noise_idx])
        lr_batch = np.asarray(fn(jnp.asarray(hr_batch), noise))
        for path, hr, lr in zip(valid, hr_batch, lr_batch):
            try:
                base = os.path.splitext(os.path.basename(path))[0]
                out_path = os.path.join(output_dir, f"{base}_train.nc")
                nav = read_nav(path)
                save_training_sample(out_path, hr, lr, nav or None)
                ok.append(out_path)
            except Exception as e:
                fail.append((path, str(e)))
    report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
    print(f"factory[{backend}]: {report.summary()} -> {output_dir}")
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Fused hr/lr train-data factory")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--kernel", required=True)
    p.add_argument("--noise-pool", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--in-group", default=GROUP_DENOISED)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    a = p.parse_args(argv)
    report = run_factory(
        a.input_dir, a.kernel, a.noise_pool, a.output_dir,
        factor=a.factor, in_group=a.in_group, batch_size=a.batch_size,
        seed=a.seed, backend=a.backend,
    )
    return 0 if report.n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
