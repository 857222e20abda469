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

Two priors are provided (`oracle_sweep(prior=...)`), and the report
takes the best:

- "grad": lam * ||grad x||^2 — the generic smoothness Tikhonov above.
- "matched": the Wiener/LMMSE prior — per-band data term
  ||A x - y||^2 / sigma_b^2 (sigma_b^2 = the measured noise-pool
  variance) plus the spectral penalty mu * sigma_b^2 * x^T S_b^{-1} x,
  where S_b(k) is the EMPIRICAL mean power spectrum of example HR
  patches (explicit oracle knowledge: the true second-order statistics
  of the signal). mu = 1 is the theory-matched weight; the sweep frees
  it to absorb normalization error. For a stationary Gaussian signal in
  white Gaussian noise this is the optimal LINEAR estimator for the
  known factory operator, so "SR vs best oracle" measures how far the
  learned non-linear prior reaches beyond the linear information
  channel. (Measured on the x8 quality data: BOTH priors' optima land
  at or slightly below bilinear — the x8+noise channel is so
  noise-dominated that bilinear already saturates the linear bound, and
  the SR margin is entirely beyond-linear gain. The report states this
  instead of a gap-closure percentage when it happens.)
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


@functools.partial(
    jax.jit, static_argnames=("factor", "iters", "per_sample")
)
def _deconv_batch(
    lr_b: jax.Array,
    kernel: jax.Array,
    factor: int,
    lam: jax.Array,
    w_prior: jax.Array | None,
    inv_nvar: jax.Array | None,
    iters: int = 100,
    per_sample: bool = False,
) -> jax.Array:
    """One batched CG solve over [N, C, h, w] LRs (shared or per-sample
    kernel). The system is block-diagonal across samples, so solving
    jointly is exact; batching keeps the TPU busy instead of paying one
    dispatch per patch. w_prior [C, H, W] switches the penalty from the
    gradient Laplacian (None) to the matched spectral prior; inv_nvar
    [C] adds the per-band noise weighting of the data term."""
    n = lr_b.shape[0]
    hr_shape = (n, lr_b.shape[1],
                lr_b.shape[2] * factor, lr_b.shape[3] * factor)
    x0 = jnp.repeat(jnp.repeat(lr_b, factor, axis=-2), factor, axis=-1)

    if per_sample:
        fwd = jax.vmap(lambda x, k: degrade(x, k, factor=factor))
        _, vjp = jax.vjp(lambda x: fwd(x, kernel),
                         jnp.zeros(hr_shape, lr_b.dtype))
    else:
        fwd1 = lambda x: degrade(x, kernel, factor=factor)  # noqa: E731
        _, vjp = jax.vjp(jax.vmap(fwd1), jnp.zeros(hr_shape, lr_b.dtype))
    at = lambda y: vjp(y)[0]  # noqa: E731
    fw = (lambda x: fwd(x, kernel)) if per_sample else jax.vmap(fwd1)

    if inv_nvar is not None:
        dscale = inv_nvar[None, :, None, None]
    else:
        dscale = 1.0

    if w_prior is None:
        pen = _grad_sq_op
    else:
        def pen(x):
            return jnp.real(
                jnp.fft.ifft2(w_prior * jnp.fft.fft2(x))
            ).astype(x.dtype)

    def normal_op(x):
        return at(fw(x) * dscale) + lam * pen(x)

    b = at(lr_b * dscale)
    x, _ = jax.scipy.sparse.linalg.cg(normal_op, b, x0=x0, maxiter=iters)
    return x


def matched_prior(hr_examples, noise_var):
    """Wiener weights from data: per-band spectral penalty
    w_b(k) = sigma_b^2 / S_b(k) with S_b the empirical mean power
    spectrum of `hr_examples` [N, C, H, W] (use TRAIN pairs, not the
    eval holdout), and the data-term weights 1/sigma_b^2. DC is left to
    the data term. Returns (w_prior [C, H, W] f32, inv_nvar [C] f32)."""
    import numpy as np

    hr_examples = np.nan_to_num(np.asarray(hr_examples))
    _, _, H, W = hr_examples.shape
    spec = np.abs(np.fft.fft2(hr_examples)) ** 2
    S = spec.mean(axis=0) / (H * W)
    S = np.maximum(S, S.max(axis=(-2, -1), keepdims=True) * 1e-9)
    nv = np.asarray(noise_var, np.float64)
    w = (nv[:, None, None] / S).astype(np.float32)
    w[:, 0, 0] = 0.0
    return w, (1.0 / nv).astype(np.float32)


def oracle_sweep(
    lr_batch,
    hr_batch,
    kernel,
    factor: int,
    lams: Sequence[float] | None = None,
    iters: int = 100,
    prior: str = "grad",
    noise_var=None,
    spec_examples=None,
    chunk: int = 24,
):
    """Best-lam oracle over a holdout batch.

    lr_batch: [N, C, h, w]; hr_batch: [N, C, H, W]; kernel: [C, kh, kw]
    shared across the batch, or [N, C, kh, kw] per-sample (the MoE
    factory routes each patch through its selected expert). Returns
    (best_lam, preds [N, C, H, W], per_lam_psnr dict). PSNR uses each
    image's HR dynamic range (same convention as the quality report).

    prior="grad" sweeps the gradient-Tikhonov weight; prior="matched"
    requires noise_var [C] (measured pool variance) and spec_examples
    [M, C, H, W] (HR patches whose mean spectrum defines the Wiener
    prior) and sweeps the global multiplier mu around its matched
    value 1."""
    import numpy as np

    from ..ops.metrics import psnr

    if lams is None:
        lams = ((0.3, 1.0, 3.0, 10.0) if prior == "matched"
                else (1e-4, 3e-4, 1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1))
    if prior == "matched":
        if noise_var is None or spec_examples is None:
            raise ValueError(
                "prior='matched' needs noise_var and spec_examples")
        w_np, inv_np = matched_prior(spec_examples, noise_var)
        w_prior, inv_nvar = jnp.asarray(w_np), jnp.asarray(inv_np)
    elif prior == "grad":
        w_prior = inv_nvar = None
    else:
        raise ValueError(f"unknown prior {prior!r}")

    kernel = jnp.asarray(kernel)
    per_sample = kernel.ndim == 4
    n = lr_batch.shape[0]
    results = {}
    preds_by_lam = {}
    for lam in lams:
        preds = []
        for s in range(0, n, chunk):
            kc = kernel[s : s + chunk] if per_sample else kernel
            preds.append(np.asarray(_deconv_batch(
                jnp.asarray(lr_batch[s : s + chunk]), kc, factor,
                jnp.float32(lam), w_prior, inv_nvar, iters=iters,
                per_sample=per_sample,
            )))
        preds = np.concatenate(preds)
        scores = []
        for i in range(n):
            hr = np.asarray(hr_batch[i])
            dr = float(np.nanmax(hr) - np.nanmin(hr)) or 1.0
            scores.append(
                float(psnr(jnp.asarray(preds[i]), jnp.asarray(hr), dr)))
        results[lam] = float(np.mean(scores))
        preds_by_lam[lam] = preds
    best = max(results, key=results.get)
    return best, preds_by_lam[best], results
