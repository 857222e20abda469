"""Robust noise-sigma estimation (wavelet-detail MAD).

Semantics follow skimage's `estimate_sigma` (used by the reference at
`denoise/denoise.py:47`): a single-level 2-D Daubechies-2 DWT in
PyWavelets' convention, take the diagonal (HH/'dd') detail subband, drop
exact-zero coefficients (skimage filters `detail_coeffs[np.nonzero(...)]`
— load-bearing on NaN-filled scenes, where constant filled regions emit
exact zeros that would otherwise bias the median low), and estimate
    sigma = median(|HH|) / 0.67448975   (1 / norm.ppf(0.75)).

DWT convention, pinned to pywt's `downsampling_convolution` with the
default mode='symmetric' (half-sample symmetric extension, edge sample
duplicated): output sample o is the convolution of the extended signal
with the decomposition filter evaluated at position 2o+1,
    out[o] = sum_j filt[j] * x_ext[2o + 1 - j],
length floor((N + F - 1)/2). The spelling below — np.pad(symmetric) by
F-1, VALID np.convolve, take [1::2] — is algebraically identical:
valid[m] = sum_j filt[j] * x_ext[m - j], and m = 2o+1 gives exactly the
pywt samples with the same count. Verified against the independently
spelled twin in tests/helpers/skimage_twin.py (explicit per-tap gather).

Divergence (documented): on an image whose HH subband is identically
zero (exactly constant input) skimage returns NaN (median of an empty
array), which would poison h = h_factor * sigma and the whole denoised
band; this implementation returns 0.0 — h becomes 0 and NLM degrades to
a near-identity, which is the only sane answer for a constant band.

Since the HH filter pair is orthonormal, the estimate is unbiased on
white Gaussian noise and near-zero on smooth images — the two properties
the denoiser's h = h_factor * sigma contract relies on.

Both a numpy host version and a jittable JAX version are provided (the
JAX one runs inside the fused denoise pipeline on device).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Daubechies-2 decomposition filters (orthonormal).
_DB2_LO = np.array(
    [-0.12940952255092145, 0.22414386804185735, 0.836516303737469, 0.48296291314469025]
)
_DB2_HI = np.array(
    [-0.48296291314469025, 0.836516303737469, -0.22414386804185735, -0.12940952255092145]
)
_MAD_TO_SIGMA = 1.0 / 0.67448975  # 1 / norm.ppf(0.75)


def _dwt_rows_np(x: np.ndarray, filt: np.ndarray) -> np.ndarray:
    """Filter rows (symmetric pad, stride-2 downsample)."""
    flen = len(filt)
    xp = np.pad(x, ((0, 0), (flen - 1, flen - 1)), mode="symmetric")
    full = np.apply_along_axis(lambda r: np.convolve(r, filt, mode="valid"), 1, xp)
    return full[:, 1::2]


def hh_subband_np(img: np.ndarray) -> np.ndarray:
    """Diagonal detail coefficients of a single-level db2 DWT."""
    d = _dwt_rows_np(np.asarray(img, np.float64), _DB2_HI)
    d = _dwt_rows_np(d.T, _DB2_HI).T
    return d


def estimate_sigma_np(img: np.ndarray) -> float:
    """Host-side sigma estimate; NaNs must be filled by the caller."""
    hh = hh_subband_np(img)
    hh = hh[hh != 0]  # skimage drops exact zeros before the median
    if hh.size == 0:
        return 0.0  # constant image (skimage: NaN — see module docstring)
    return float(np.median(np.abs(hh)) * _MAD_TO_SIGMA)


def _dwt_rows_jax(x: jax.Array, filt: jax.Array) -> jax.Array:
    flen = filt.shape[0]
    xp = jnp.pad(x, ((0, 0), (flen - 1, flen - 1)), mode="symmetric")
    # valid cross-correlation with the flipped filter == convolution
    w = jnp.flip(filt)[None, None, None, :]
    out = jax.lax.conv_general_dilated(
        xp[None, None],
        w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )[0, 0]
    return out[:, 1::2]


def estimate_sigma(img: jax.Array) -> jax.Array:
    """Jittable sigma estimate of a 2-D image (NaN-free input)."""
    img = jnp.asarray(img, jnp.float32)
    d = _dwt_rows_jax(img, jnp.asarray(_DB2_HI, jnp.float32))
    d = _dwt_rows_jax(d.T, jnp.asarray(_DB2_HI, jnp.float32)).T
    # zero-drop under jit: exact zeros -> NaN, nanmedian over the rest;
    # all-zero subband (constant image) -> 0.0
    nz = d != 0.0
    sig = jnp.nanmedian(jnp.where(nz, jnp.abs(d), jnp.nan)) * _MAD_TO_SIGMA
    return jnp.where(jnp.any(nz), sig, 0.0)
