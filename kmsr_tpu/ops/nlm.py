"""Non-local means denoising — dense shifted-window formulation.

Capability parity with the reference's per-band NLM
(`denoise/denoise.py:34-67`): float NLM with patch_size=7,
patch_distance=11, fast-mode weights
    w_t(p) = exp(-max(mean_sq_patch_diff(p, p+t) - 2*sigma^2, 0) / h^2),
NaN pixels filled with the band mean before denoising and restored after,
h = h_factor * estimate_sigma(band).

TPU-first restructuring: the irregular per-pixel neighborhood search is
expressed as a dense sweep over the (2d+1)^2 shift lattice — for each
shift, an elementwise squared difference, a separable box filter (the
patch-distance integral), an exp weight, and an fma. Every step is a
full-image VPU op; the shift loop is a `lax.fori_loop` with dynamic
slices, so one jit covers all 529 shifts. A numpy reference
implementation backs the parity tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sigma import estimate_sigma, estimate_sigma_np

PATCH_SIZE = 7
PATCH_DISTANCE = 11


def _box_filter_np(x: np.ndarray, size: int) -> np.ndarray:
    """VALID box sum via cumulative sums. [H,W] -> [H-size+1, W-size+1]."""
    c = np.cumsum(np.cumsum(x, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    return (
        c[size:, size:] - c[:-size, size:] - c[size:, :-size] + c[:-size, :-size]
    )


def nlm_denoise_np(
    img: np.ndarray,
    h: float,
    sigma: float = 0.0,
    patch_size: int = PATCH_SIZE,
    patch_distance: int = PATCH_DISTANCE,
) -> np.ndarray:
    """Reference (numpy) fast NLM on a NaN-free 2-D image."""
    img = np.asarray(img, np.float64)
    hgt, wid = img.shape
    o = patch_size // 2
    pad = patch_distance + o
    up = np.pad(img, pad, mode="reflect")
    out = np.zeros((hgt, wid))
    wsum = np.zeros((hgt, wid))
    var2 = 2.0 * sigma * sigma
    h2 = h * h if h > 0 else 1e-12
    n_pix = patch_size * patch_size
    for t1 in range(-patch_distance, patch_distance + 1):
        for t2 in range(-patch_distance, patch_distance + 1):
            # squared diff on the region covering all patch windows
            a = up[pad - o : pad + hgt + o, pad - o : pad + wid + o]
            b = up[
                pad + t1 - o : pad + t1 + hgt + o,
                pad + t2 - o : pad + t2 + wid + o,
            ]
            sq = (a - b) ** 2
            dist = _box_filter_np(sq, patch_size) / n_pix  # [H, W]
            w = np.exp(-np.maximum(dist - var2, 0.0) / h2)
            shifted = up[pad + t1 : pad + t1 + hgt, pad + t2 : pad + t2 + wid]
            out += w * shifted
            wsum += w
    return out / wsum


def _box_filter_jax(x: jax.Array, size: int) -> jax.Array:
    """VALID separable box sum."""
    ones = jnp.ones((1, 1, 1, size), x.dtype)
    y = jax.lax.conv_general_dilated(
        x[None, None], ones, (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, jnp.ones((1, 1, size, 1), x.dtype), (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[0, 0]


@functools.partial(jax.jit, static_argnames=("patch_size", "patch_distance"))
def nlm_denoise_2d(
    img: jax.Array,
    h: jax.Array | float,
    sigma: jax.Array | float = 0.0,
    patch_size: int = PATCH_SIZE,
    patch_distance: int = PATCH_DISTANCE,
) -> jax.Array:
    """Jittable fast NLM on a NaN-free 2-D image."""
    img = jnp.asarray(img, jnp.float32)
    hgt, wid = img.shape
    o = patch_size // 2
    pad = patch_distance + o
    up = jnp.pad(img, pad, mode="reflect")
    var2 = 2.0 * jnp.asarray(sigma, jnp.float32) ** 2
    h2 = jnp.maximum(jnp.asarray(h, jnp.float32) ** 2, 1e-12)
    n_pix = patch_size * patch_size
    n_shift = 2 * patch_distance + 1

    a = jax.lax.dynamic_slice(
        up, (pad - o, pad - o), (hgt + 2 * o, wid + 2 * o)
    )

    def body(i, carry):
        out, wsum = carry
        t1 = i // n_shift - patch_distance
        t2 = i % n_shift - patch_distance
        b = jax.lax.dynamic_slice(
            up, (pad + t1 - o, pad + t2 - o), (hgt + 2 * o, wid + 2 * o)
        )
        dist = _box_filter_jax((a - b) ** 2, patch_size) / n_pix
        w = jnp.exp(-jnp.maximum(dist - var2, 0.0) / h2)
        shifted = jax.lax.dynamic_slice(
            up, (pad + t1, pad + t2), (hgt, wid)
        )
        return out + w * shifted, wsum + w

    out, wsum = jax.lax.fori_loop(
        0,
        n_shift * n_shift,
        body,
        (jnp.zeros((hgt, wid), jnp.float32), jnp.zeros((hgt, wid), jnp.float32)),
    )
    return out / wsum


def denoise_band(
    band: np.ndarray,
    h_factor: float = 1.8,
    patch_size: int = PATCH_SIZE,
    patch_distance: int = PATCH_DISTANCE,
    use_device: bool = True,
) -> tuple[np.ndarray, float]:
    """Full per-band contract (`denoise/denoise.py:34-67`): NaN-fill with
    the band mean, estimate sigma, h = h_factor * sigma, NLM, restore NaNs.

    Returns (denoised with NaNs restored, estimated sigma).
    """
    band = np.asarray(band, np.float32)
    valid = ~np.isnan(band)
    if not valid.any():
        return band, 0.0
    fill = float(np.nanmean(band))
    filled = np.where(valid, band, fill).astype(np.float32)
    if use_device:
        sig = float(estimate_sigma(jnp.asarray(filled)))
        den = np.asarray(
            nlm_denoise_2d(
                jnp.asarray(filled),
                h_factor * sig,
                sig,
                patch_size=patch_size,
                patch_distance=patch_distance,
            )
        )
    else:
        sig = estimate_sigma_np(filled)
        den = nlm_denoise_np(
            filled, h_factor * sig, sig, patch_size, patch_distance
        ).astype(np.float32)
    return np.where(valid, den, np.nan).astype(np.float32), sig


def denoise_stack(
    stack: np.ndarray, h_factor: float = 1.8, use_device: bool = True
) -> tuple[np.ndarray, list[float]]:
    """Denoise a [C, H, W] band stack; returns (denoised, per-band sigmas)."""
    outs, sigmas = [], []
    for c in range(stack.shape[0]):
        den, sig = denoise_band(stack[c], h_factor=h_factor, use_device=use_device)
        outs.append(den)
        sigmas.append(sig)
    return np.stack(outs, axis=0), sigmas
