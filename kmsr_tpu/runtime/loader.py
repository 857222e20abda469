"""ctypes binding + build for the native threaded patch loader.

Builds `csrc/patch_loader.cpp` with g++ on first use (cached in
``~/.cache/kmsr_tpu``); if no toolchain is available the caller should fall
back to the pure-numpy `PatchPool`. See `NativePatchLoader` for the
double-buffered prefetch pattern used by the trainers.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "patch_loader.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


class NativeLoaderUnavailable(RuntimeError):
    pass


def _build_library() -> Path:
    cache = Path(os.environ.get("KMSR_CACHE_DIR", Path.home() / ".cache" / "kmsr_tpu"))
    cache.mkdir(parents=True, exist_ok=True)
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so_path = cache / f"patch_loader_{tag}.so"
    if so_path.exists():
        return so_path
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(so_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise NativeLoaderUnavailable(f"g++ build failed: {detail}") from e
    return so_path


def _get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(str(_build_library()))
            lib.kmsr_loader_create.restype = ctypes.c_void_p
            lib.kmsr_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int64, ctypes.c_int,
            ]
            lib.kmsr_loader_gather.restype = ctypes.c_int
            lib.kmsr_loader_gather.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.kmsr_loader_prefetch.restype = ctypes.c_int
            lib.kmsr_loader_prefetch.argtypes = lib.kmsr_loader_gather.argtypes
            split_args = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.kmsr_loader_gather_split.restype = ctypes.c_int
            lib.kmsr_loader_gather_split.argtypes = split_args
            lib.kmsr_loader_prefetch_split.restype = ctypes.c_int
            lib.kmsr_loader_prefetch_split.argtypes = split_args
            dual_args = split_args + [ctypes.POINTER(ctypes.c_float)]
            lib.kmsr_loader_gather_split_dual.restype = ctypes.c_int
            lib.kmsr_loader_gather_split_dual.argtypes = dual_args
            lib.kmsr_loader_prefetch_split_dual.restype = ctypes.c_int
            lib.kmsr_loader_prefetch_split_dual.argtypes = dual_args
            lib.kmsr_loader_wait.restype = ctypes.c_int
            lib.kmsr_loader_wait.argtypes = [ctypes.c_void_p]
            lib.kmsr_loader_num_files.restype = ctypes.c_int64
            lib.kmsr_loader_num_files.argtypes = [ctypes.c_void_p]
            lib.kmsr_loader_last_error.restype = ctypes.c_char_p
            lib.kmsr_loader_last_error.argtypes = [ctypes.c_void_p]
            lib.kmsr_loader_destroy.restype = None
            lib.kmsr_loader_destroy.argtypes = [ctypes.c_void_p]
            _LIB = lib
    return _LIB


class NativePatchLoader:
    """Threaded native gather of float32 .npy patches with async prefetch.

    Usage (double buffering):
        loader = NativePatchLoader(paths, shape=(5, 256, 256))
        batch = loader.gather(idx0)                 # blocking
        loader.prefetch(idx1)                       # overlap with step
        ...device step on `batch`...
        batch = loader.wait()                       # the idx1 batch
    """

    def __init__(
        self,
        paths: Sequence[str],
        shape: tuple[int, ...],
        n_threads: int = 8,
    ):
        self.paths = [str(p) for p in paths]
        self.shape = tuple(shape)
        self._floats = int(np.prod(shape))
        lib = _get_lib()
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._handle = lib.kmsr_loader_create(
            arr, len(self.paths), self._floats, n_threads
        )
        if not self._handle:
            raise NativeLoaderUnavailable("loader create failed (bad npy files?)")
        self._lib = lib
        self._pending: Optional[tuple[np.ndarray, np.ndarray]] = None

    def __len__(self) -> int:
        return len(self.paths)

    def _err(self) -> str:
        return self._lib.kmsr_loader_last_error(self._handle).decode()

    def gather(self, indices: np.ndarray) -> np.ndarray:
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(indices), *self.shape), np.float32)
        rc = self._lib.kmsr_loader_gather(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native gather failed: {self._err()}")
        return out

    def _split_dims(self, factor: int) -> tuple[int, int, int]:
        if len(self.shape) != 3:
            raise ValueError(
                f"split gather needs [C, H, W] patches, loader shape is {self.shape}"
            )
        c, h, w = self.shape
        if h % factor or w % factor:
            raise ValueError(f"H, W must be multiples of factor: {(h, w, factor)}")
        return c, h, w

    def gather_split(
        self, indices: np.ndarray, factor: int = 8, halo: bool = True
    ) -> np.ndarray:
        """Gather straight into the pre-split degrade layout
        [C, f, H/f + 2*halo, W, B] consumed by
        `ops.degrade_pallas.degrade_pallas_presplit` (column phases
        contiguous, batch in lanes; halo=True bakes the replicate halo
        rows, halo=False is the `baked_halo=False` kernel's layout —
        natural byte count, measured faster on chip). Costs the host the
        same work as a CHWB assembly — only the write order differs —
        and saves the device the in-kernel permutation."""
        c, h, w = self._split_dims(factor)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty(
            (c, factor, h // factor + 2 * halo, w, len(indices)), np.float32
        )
        rc = self._lib.kmsr_loader_gather_split(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices), c, h, w, factor, int(halo),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native split gather failed: {self._err()}")
        return out

    def prefetch_split(
        self, indices: np.ndarray, factor: int = 8, halo: bool = True
    ) -> None:
        if self._pending is not None:
            raise RuntimeError("a prefetch is already in flight")
        c, h, w = self._split_dims(factor)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty(
            (c, factor, h // factor + 2 * halo, w, len(indices)), np.float32
        )
        rc = self._lib.kmsr_loader_prefetch_split(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices), c, h, w, factor, int(halo),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native split prefetch failed (rc={rc}): {self._err()}")
        self._pending = (indices, out)

    def prefetch_split_dual(
        self, indices: np.ndarray, factor: int = 8, halo: bool = True
    ) -> None:
        """Async dual gather: ONE file read per patch fills both the
        pre-split device layout and the natural [B, C, H, W] batch.
        `wait()` returns (split, natural)."""
        if self._pending is not None:
            raise RuntimeError("a prefetch is already in flight")
        c, h, w = self._split_dims(factor)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty(
            (c, factor, h // factor + 2 * halo, w, len(indices)), np.float32
        )
        nat = np.empty((len(indices), c, h, w), np.float32)
        rc = self._lib.kmsr_loader_prefetch_split_dual(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices), c, h, w, factor, int(halo),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(
                f"native dual split prefetch failed (rc={rc}): {self._err()}"
            )
        self._pending = (indices, (out, nat))

    def prefetch(self, indices: np.ndarray) -> None:
        if self._pending is not None:
            raise RuntimeError("a prefetch is already in flight")
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(indices), *self.shape), np.float32)
        rc = self._lib.kmsr_loader_prefetch(
            self._handle,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"native prefetch failed (rc={rc}): {self._err()}")
        self._pending = (indices, out)

    def wait(self) -> np.ndarray:
        if self._pending is None:
            raise RuntimeError("no prefetch in flight")
        rc = self._lib.kmsr_loader_wait(self._handle)
        _, out = self._pending
        self._pending = None
        if rc != 0:
            raise IOError(f"native prefetch failed: {self._err()}")
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.kmsr_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
