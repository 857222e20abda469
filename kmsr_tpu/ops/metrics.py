"""Image-quality metrics: PSNR and SSIM (jittable).

Used by the SR harness for the BASELINE "PSNR/SSIM parity" contract.
SSIM follows Wang et al. 2004 with the standard 11x11 sigma=1.5 Gaussian
window and K1=0.01, K2=0.03.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def psnr(a: jax.Array, b: jax.Array, data_range: float | jax.Array) -> jax.Array:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jax.Array:
    xs = jnp.arange(size) - (size - 1) / 2.0
    g = jnp.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(x: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise VALID filter. x: [C, H, W]."""
    c = x.shape[0]
    w = jnp.broadcast_to(win, (c, *win.shape))[:, None]
    return jax.lax.conv_general_dilated(
        x[None],
        w,
        (1, 1),
        "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )[0]


@functools.partial(jax.jit, static_argnames=("win_size",))
def ssim(
    a: jax.Array,
    b: jax.Array,
    data_range: float | jax.Array,
    win_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean SSIM over a [C, H, W] pair."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = _gaussian_window(win_size, sigma)
    mu_a = _filter2d(a, win)
    mu_b = _filter2d(b, win)
    mu_aa = _filter2d(a * a, win)
    mu_bb = _filter2d(b * b, win)
    mu_ab = _filter2d(a * b, win)
    var_a = mu_aa - mu_a**2
    var_b = mu_bb - mu_b**2
    cov = mu_ab - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)
