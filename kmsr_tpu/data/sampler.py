"""Host-side patch pools and batch samplers.

The reference re-opens ~32 NetCDF files from disk on EVERY training
iteration (`single_kernel/train.py:255-268` — its dominant host cost).
Here a `PatchPool` loads the folder ONCE into a contiguous pinned numpy
array `[N, C, H, W]` and sampling a batch is pure indexing, so the input
pipeline never stalls the device. NaN gating matches the reference's hard
loader assertions (`single_kernel/train.py:72-79`).
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np

from ..io.ncio import read_band_stack
from ..io.schema import BAND_NAMES, GROUP_DENOISED


class NaNPatchError(ValueError):
    """A training patch contains NaN — it should have been filtered at
    patch-cut time (reference parity: hard error, not silent skip)."""


def list_patch_files(
    patch_dir: str, pattern: str = "*.nc", host_shard: bool = True
) -> list[str]:
    """Sorted file list; under a multi-host launch each host gets its own
    deterministic strided shard (identity for a single process), so every
    file-in/file-out pipeline stage scales across hosts with no flag —
    file bytes never cross DCN (`parallel.multihost`)."""
    files = sorted(glob.glob(os.path.join(patch_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} files in {patch_dir}")
    if host_shard:
        import jax

        if jax.process_count() > 1:
            from ..parallel.multihost import host_shard as shard

            files = shard(files)
            if not files:
                raise FileNotFoundError(
                    f"host {jax.process_index()}'s shard of {patch_dir} is empty"
                )
    return files


class PatchPool:
    """An in-memory pool of [C, H, W] patches with batch sampling."""

    def __init__(
        self,
        patches: np.ndarray,
        sources: Optional[Sequence[str]] = None,
        allow_nan: bool = False,
    ):
        patches = np.ascontiguousarray(patches, dtype=np.float32)
        if patches.ndim != 4:
            raise ValueError(f"expected [N,C,H,W], got {patches.shape}")
        nan_mask = (
            np.zeros(patches.shape[0], bool)
            if allow_nan
            else np.isnan(patches).reshape(patches.shape[0], -1).any(axis=1)
        )
        if nan_mask.any():
            idx = int(np.argmax(nan_mask))
            src = sources[idx] if sources else f"patch {idx}"
            count = int(np.isnan(patches[idx]).sum())
            raise NaNPatchError(
                f"{src} contains {count} NaN pixels "
                f"({count / patches[idx].size * 100:.2f}%); patches with NaN "
                "must be filtered at the patch-cutting stage."
            )
        self.patches = patches
        self.sources = list(sources) if sources else None

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_nc_dir(
        cls,
        patch_dir: str,
        group: str = GROUP_DENOISED,
        band_names: Sequence[str] = BAND_NAMES,
        allow_nan: bool = False,
    ) -> "PatchPool":
        files = list_patch_files(patch_dir, "*.nc")
        stacks = [read_band_stack(f, group, band_names) for f in files]
        return cls(np.stack(stacks, axis=0), sources=files, allow_nan=allow_nan)

    @classmethod
    def from_npy_dir(cls, patch_dir: str, allow_nan: bool = False) -> "PatchPool":
        files = list_patch_files(patch_dir, "*.npy")
        stacks = [np.load(f).astype(np.float32) for f in files]
        return cls(np.stack(stacks, axis=0), sources=files, allow_nan=allow_nan)

    # -- sampling -----------------------------------------------------------
    def __len__(self) -> int:
        return self.patches.shape[0]

    @property
    def shape(self) -> tuple:
        return self.patches.shape

    def sample(self, rng: np.random.Generator, batch_size: int) -> np.ndarray:
        """Random batch of full patches [B, C, H, W] (with replacement,
        like the reference's randint file choice)."""
        idx = rng.integers(0, len(self), size=batch_size)
        return self.patches[idx]

    def sample_crops(
        self, rng: np.random.Generator, batch_size: int, crop: int
    ) -> np.ndarray:
        """Random batch of random crops [B, C, crop, crop]."""
        _, c, h, w = self.patches.shape
        if h < crop or w < crop:
            raise ValueError(f"patch {h}x{w} smaller than crop {crop}")
        idx = rng.integers(0, len(self), size=batch_size)
        ys = rng.integers(0, h - crop + 1, size=batch_size)
        xs = rng.integers(0, w - crop + 1, size=batch_size)
        out = np.empty((batch_size, c, crop, crop), np.float32)
        for i, (j, y, x) in enumerate(zip(idx, ys, xs)):
            out[i] = self.patches[j, :, y : y + crop, x : x + crop]
        return out


class StreamingPatchPool:
    """PatchPool-compatible sampler backed by the native threaded loader
    (`kmsr_tpu.runtime.NativePatchLoader`) — for datasets too large to hold
    in memory. Same `sample`/`sample_crops` API as `PatchPool`.
    """

    def __init__(self, patch_dir: str, shape: tuple[int, int, int], n_threads: int = 8):
        from ..runtime import NativePatchLoader

        self.files = list_patch_files(patch_dir, "*.npy")
        self._loader = NativePatchLoader(self.files, shape=shape, n_threads=n_threads)
        self.shape_single = tuple(shape)
        self.sources = self.files

    def __len__(self) -> int:
        return len(self.files)

    @property
    def shape(self) -> tuple:
        return (len(self.files), *self.shape_single)

    def sample(self, rng: np.random.Generator, batch_size: int) -> np.ndarray:
        idx = rng.integers(0, len(self), size=batch_size).astype(np.int64)
        return self._loader.gather(idx)

    def sample_crops(
        self, rng: np.random.Generator, batch_size: int, crop: int
    ) -> np.ndarray:
        full = self.sample(rng, batch_size)
        _, h, w = self.shape_single
        ys = rng.integers(0, h - crop + 1, size=batch_size)
        xs = rng.integers(0, w - crop + 1, size=batch_size)
        out = np.empty((batch_size, self.shape_single[0], crop, crop), np.float32)
        for i, (y, x) in enumerate(zip(ys, xs)):
            out[i] = full[i, :, y : y + crop, x : x + crop]
        return out

    def prefetch(self, rng: np.random.Generator, batch_size: int) -> None:
        idx = rng.integers(0, len(self), size=batch_size).astype(np.int64)
        self._loader.prefetch(idx)

    def wait(self) -> np.ndarray:
        return self._loader.wait()


def synthetic_pool(
    rng: np.random.Generator,
    n: int = 32,
    c: int = 5,
    size: int = 256,
    blur_sigma: float | None = 1.5,
) -> PatchPool:
    """Synthetic Landsat-like patches for tests/benchmarks: smooth random
    fields with positive radiance-scale values."""
    base = rng.normal(5.0, 2.0, size=(n, c, size, size)).astype(np.float32)
    if blur_sigma:
        # cheap separable smoothing to give images spatial structure
        k = int(3 * blur_sigma) | 1
        xs = np.arange(k) - k // 2
        g = np.exp(-(xs**2) / (2 * blur_sigma**2)).astype(np.float32)
        g /= g.sum()
        base = np.apply_along_axis(
            lambda m: np.convolve(m, g, mode="same"), 2, base
        )
        base = np.apply_along_axis(
            lambda m: np.convolve(m, g, mode="same"), 3, base
        )
    return PatchPool(base.astype(np.float32))
