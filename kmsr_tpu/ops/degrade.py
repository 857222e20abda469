"""Degradation math: per-band blur + downsample, pure-XLA path.

Semantics match the reference degrader (`C_30apply_kernel_to_landsat.py:
68-124`): per-band kernel renormalization, replicate ("edge") padding,
depthwise (grouped) 2-D cross-correlation, then x8 downsampling realized as
three stacked 2x2 average pools — which is *exactly* one 8x8 block mean, so
we compute it that way in one reshape-reduce.

TPU-first notes:
  * The blur + block-mean pair composes into ONE strided depthwise conv
    with kernel (k * box_d)/d^2: see `compose_with_box` + `degrade_strided`.
    That form is what the fused Pallas kernel implements; the unfused path
    here is the parity/fallback reference.
  * Everything is batch-first `[B, C, H, W]`, vmapped/sharded along B.
  * Implementations raced on v5e at batch 8192 (64^2 patches): XLA strided
    depthwise conv ~850-950k patches/s; Pallas batch-in-lanes stencil ~670k;
    dense stride-matrix matmul on the MXU ~520k at f32 precision (the 10x
    FLOP inflation of densifying the stencil eats the MXU advantage).
    The XLA conv stays the default (`degrade_fused`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def normalize_kernel(kernel: jax.Array) -> jax.Array:
    """Renormalize each band's kernel to sum 1 (no-op if the sum is <= 0).

    Mirrors `C_30apply_kernel_to_landsat.py:93-97`.
    """
    s = jnp.sum(kernel, axis=(-2, -1), keepdims=True)
    return jnp.where(s > 0, kernel / s, kernel)


def replicate_pad(x: jax.Array, pad_h: int, pad_w: int) -> jax.Array:
    """Edge-replicate padding on the last two axes."""
    pads = [(0, 0)] * (x.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
    return jnp.pad(x, pads, mode="edge")


def depthwise_conv2d(
    x: jax.Array, kernel: jax.Array, stride: int = 1
) -> jax.Array:
    """Depthwise VALID cross-correlation.

    x: [B, C, H, W]; kernel: [C, kH, kW] -> [B, C, H', W'].

    HIGHEST precision: depthwise convs are bandwidth-bound (no MXU win from
    bf16), and the data factory has a <=1e-3 RMSE parity contract.
    """
    c = x.shape[1]
    w = kernel[:, None]  # [C, 1, kH, kW] : (out, in/groups, kH, kW)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def block_mean(x: jax.Array, factor: int) -> jax.Array:
    """Block-mean downsample by `factor` on the last two axes.

    Equal to stacking log2(factor) AvgPool2d(2,2) layers
    (`single_kernel/networks.py:40-43`) when H, W divide `factor`.
    """
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // factor, factor, w // factor, factor)
    return x.mean(axis=(3, 5))


def avg_pool2(x: jax.Array) -> jax.Array:
    """A single 2x2/stride-2 average pool (floors odd sizes like torch)."""
    b, c, h, w = x.shape
    x = x[:, :, : (h // 2) * 2, : (w // 2) * 2]
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    return x.mean(axis=(3, 5))


@functools.partial(jax.jit, static_argnames=("factor", "normalize"))
def degrade(
    img: jax.Array,
    kernel: jax.Array,
    factor: int = 8,
    normalize: bool = True,
) -> jax.Array:
    """Blur with a per-band kernel and downsample by `factor`.

    img: [B, C, H, W] or [C, H, W]; kernel: [C, kH, kW] or [kH, kW].
    Returns the same rank with H, W divided by `factor`.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    c = img.shape[1]
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (c, *kernel.shape))
    if normalize:
        kernel = normalize_kernel(kernel)
    kh, kw = kernel.shape[-2:]
    x = replicate_pad(img, kh // 2, kw // 2)
    x = depthwise_conv2d(x, kernel)
    # log2(factor) stacked 2x2 avg-pools == one factor x factor block mean.
    out = block_mean(x, factor)
    return out[0] if squeeze else out


def compose_with_box(kernel: jax.Array, factor: int) -> jax.Array:
    """Compose a blur kernel with the `factor`-wide box mean.

    blur(k) then block_mean(d) == strided conv with (k (*) box_d)/d^2 at
    stride d. Returns the composed [..., kH+d-1, kW+d-1] kernel.
    """
    *lead, kh, kw = kernel.shape
    flat = kernel.reshape(-1, 1, kh, kw)
    box = jnp.ones((1, 1, factor, factor), kernel.dtype) / (factor * factor)
    comp = jax.lax.conv_general_dilated(
        flat,
        box,
        window_strides=(1, 1),
        padding=[(factor - 1, factor - 1)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return comp.reshape(*lead, kh + factor - 1, kw + factor - 1)


@functools.partial(jax.jit, static_argnames=("factor", "normalize"))
def degrade_strided(
    img: jax.Array,
    kernel: jax.Array,
    factor: int = 8,
    normalize: bool = True,
) -> jax.Array:
    """Fused-form degrade: one strided depthwise conv (XLA).

    Numerically identical to `degrade` (same replicate padding, same
    blur+box composition) but lowered as a single conv so XLA emits one
    fused kernel. This is the fast single-op path; the Pallas kernel in
    `degrade_pallas.py` goes further by fusing noise injection.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    c = img.shape[1]
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (c, *kernel.shape))
    if normalize:
        kernel = normalize_kernel(kernel)
    kh, kw = kernel.shape[-2], kernel.shape[-1]
    comp = compose_with_box(kernel, factor)  # [C, kh+f-1, kw+f-1]
    # Padding bookkeeping: unfused path pads (kh//2, kw//2), convs VALID
    # (out H), then block-means. Composed: same pad, conv (kh+f-1) stride f.
    x = replicate_pad(img, kh // 2, kw // 2)
    out = depthwise_conv2d(x, comp, stride=factor)
    return out[0] if squeeze else out


#: im2col footprint cap for `degrade_batch_kernels` (bytes). One v5e
#: chip has 16 GB of HBM; the factory's 128-file MoE batches at 256^2
#: would materialize 28 GB of [B, C*K*K, H, W] patches unchunked
#: (caught live: `fusion.1 f32[128,845,256,256]` OOM).
_BATCH_KERNELS_IM2COL_CAP = 2 << 30


def degrade_batch_kernels(
    img: jax.Array,
    kernels: jax.Array,
    factor: int = 8,
    decimate: bool = False,
    padding: str = "same",
) -> jax.Array:
    """Per-sample per-band kernels: img [B,C,H,W], kernels [B,C,kH,kW].

    The reference realizes this with a batch-as-groups reshape trick
    (`train_gemini.py:121-129`, SAME zero padding) — here it is an MXU-
    friendly einsum over extracted patches. `decimate` selects ::factor
    subsampling (MoE variant, `train_gemini.py:134`) instead of block mean.

    Large batches are processed in `lax.map` chunks over the batch axis
    so the im2col intermediate stays under ~2 GB (training batches are
    untouched; the factory's 128-file device batches would otherwise
    materialize tens of GB). The chunk loop is differentiable, so the
    training path is unaffected semantically either way.

    NOTE (parity): the MoE variant uses zero ('SAME') padding, unlike the
    replicate padding of the single-kernel degrader; the default honors
    that. `padding="replicate"` selects the C_30/C_31 blur edge semantics
    instead (used by the factory's content-adaptive MoE mode).
    """
    b, c, h, w = img.shape
    kh, kw = kernels.shape[-2:]
    per_sample = 4 * c * kh * kw * h * w  # im2col bytes per batch element
    cb = b
    if b > 1 and b * per_sample > _BATCH_KERNELS_IM2COL_CAP:
        cb = max(min(int(_BATCH_KERNELS_IM2COL_CAP // per_sample), b), 1)
        while b % cb:  # largest divisor of B at or under the cap
            cb -= 1
    if cb < b:
        out = jax.lax.map(
            lambda t: degrade_batch_kernels(
                t[0], t[1], factor=factor, decimate=decimate, padding=padding
            ),
            (img.reshape(b // cb, cb, c, h, w),
             kernels.reshape(b // cb, cb, c, kh, kw)),
        )
        return out.reshape(b, *out.shape[2:])
    if padding == "replicate":
        img = jnp.pad(
            img, ((0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            mode="edge",
        )
        pad_spec = [(0, 0), (0, 0)]
    elif padding == "same":
        pad_spec = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    else:
        raise ValueError(f"padding must be same|replicate, got {padding!r}")
    # Extract kh*kw shifted copies: [B, C*kh*kw, H, W].
    patches = jax.lax.conv_general_dilated_patches(
        img,
        filter_shape=(kh, kw),
        window_strides=(1, 1),
        padding=pad_spec,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    patches = patches.reshape(b, c, kh * kw, h, w)
    out = jnp.einsum("bckhw,bck->bchw", patches, kernels.reshape(b, c, -1))
    if decimate:
        return out[:, :, ::factor, ::factor]
    return block_mean(out, factor)
