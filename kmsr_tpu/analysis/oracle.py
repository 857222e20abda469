"""Known-kernel deconvolution oracle for the SR quality reports.

Purpose (VERDICT r3 item 8): the quality reports defend the SR margin
with a capacity ablation and a spectral argument, but nothing measures
the actual information ceiling of the task. This module provides that
bound: reconstruct the holdout HR from its LR using the EXACT factory
degradation operator (the same `ops.degrade` — replicate-pad depthwise
blur with the known kernel + factor x factor block mean,
`C_30apply_kernel_to_landsat.py:68-124` semantics) — knowledge the SR
network does NOT have. SR-vs-oracle then converts "+N dB over bilinear"
into "closes M% of the measured oracle-bilinear gap".

Method: Tikhonov-regularized least squares solved exactly,

    x* = argmin_x ||A x - y||^2 + lam * ||grad x||^2

with A the (linear) degrade operator, grad the forward-difference image
gradient, via conjugate gradients on the normal equations
(A^T A + lam * grad^T grad) x = A^T y. A^T comes from `jax.vjp` of the
forward op — guaranteed adjoint-exact, no hand-derived transpose to get
wrong. lam is swept over a grid and the best holdout PSNR is kept: the
oracle is an UPPER bound, so it gets the most favorable regularizer
(stated in the report). The empirical pool noise is not white Gaussian,
so no closed-form Wiener lam exists; the sweep replaces it.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.degrade import degrade


def _grad_sq_op(x: jax.Array) -> jax.Array:
    """grad^T grad x for forward differences with replicate boundary
    (== graph Laplacian of the 4-neighbor grid), per channel."""
    dy = jnp.diff(x, axis=-2)  # [C, H-1, W]
    dx = jnp.diff(x, axis=-1)  # [C, H, W-1]
    out = jnp.zeros_like(x)
    out = out.at[..., :-1, :].add(-dy)
    out = out.at[..., 1:, :].add(dy)
    out = out.at[..., :, :-1].add(-dx)
    out = out.at[..., :, 1:].add(dx)
    return out


@functools.partial(
    jax.jit, static_argnames=("factor", "hr_shape", "iters")
)
def known_kernel_deconv(
    lr: jax.Array,
    kernel: jax.Array,
    factor: int,
    hr_shape: tuple,
    lam: jax.Array | float,
    iters: int = 100,
) -> jax.Array:
    """Oracle reconstruction of one [C, H, W] HR image from its LR.

    lr: [C, H/f, W/f]; kernel: [C, kH, kW] (the factory kernel);
    hr_shape: (C, H, W); lam: Tikhonov gradient weight; iters: CG steps.
    Initialized at the zero-order hold upsample (CG is a linear solver —
    the init only sets convergence speed, not the solution).
    """
    x0 = jnp.repeat(jnp.repeat(lr, factor, axis=-2), factor, axis=-1)

    def fwd(x):
        return degrade(x, kernel, factor=factor)

    _, vjp = jax.vjp(fwd, jnp.zeros(hr_shape, lr.dtype))
    at = lambda y: vjp(y)[0]  # noqa: E731  adjoint of the linear fwd

    def normal_op(x):
        return at(fwd(x)) + lam * _grad_sq_op(x)

    b = at(lr)
    x, _ = jax.scipy.sparse.linalg.cg(normal_op, b, x0=x0, maxiter=iters)
    return x


def oracle_sweep(
    lr_batch,
    hr_batch,
    kernel,
    factor: int,
    lams: Sequence[float] = (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2),
    iters: int = 100,
):
    """Best-lam oracle over a holdout batch.

    lr_batch: [N, C, h, w]; hr_batch: [N, C, H, W]; kernel: [C, kh, kw]
    shared across the batch, or [N, C, kh, kw] per-sample (the MoE
    factory routes each patch through its selected expert). Returns
    (best_lam, preds [N, C, H, W], per_lam_psnr dict). PSNR uses each
    image's HR dynamic range (same convention as the quality report).
    """
    import numpy as np

    from ..ops.metrics import psnr

    kernel = jnp.asarray(kernel)
    per_sample = kernel.ndim == 4
    hr_shape = tuple(hr_batch.shape[1:])
    results = {}
    preds_by_lam = {}
    for lam in lams:
        preds = []
        scores = []
        for i in range(lr_batch.shape[0]):
            pred = known_kernel_deconv(
                jnp.asarray(lr_batch[i]),
                kernel[i] if per_sample else kernel,
                factor, hr_shape, jnp.float32(lam), iters=iters,
            )
            pred = np.asarray(pred)
            hr = np.asarray(hr_batch[i])
            dr = float(np.nanmax(hr) - np.nanmin(hr)) or 1.0
            scores.append(float(psnr(jnp.asarray(pred), jnp.asarray(hr), dr)))
            preds.append(pred)
        results[lam] = float(np.mean(scores))
        preds_by_lam[lam] = np.stack(preds)
    best = max(results, key=results.get)
    return best, preds_by_lam[best], results
