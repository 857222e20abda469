"""Closed-form composition of stacked linear conv layers into one kernel.

A chain of (bias-free) conv layers is itself a single linear convolution;
its effective kernel is the channel-contracted full convolution of the
per-layer weights. The reference computes this with a Python triple loop of
tiny 1x1 convs per training iteration (`single_kernel/networks.py:119-157`);
here each layer composition is ONE `lax.conv_general_dilated` call with
"full" padding, so the whole 13x13 composition is jittable and runs on
device inside the training step.

Shapes follow OIHW: layer weights `[C_out, C_in, kH, kW]`.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def compose_pair(w_next: jax.Array, k_cur: jax.Array) -> jax.Array:
    """Compose `w_next` applied after the accumulated kernel `k_cur`.

    k_cur: [C_mid, C_in, aH, aW]  (effective kernel so far)
    w_next: [C_out, C_mid, bH, bW] (next layer's weight)
    returns [C_out, C_in, aH+bH-1, aW+bW-1]

    Math: two stacked cross-correlations with kernels A then B act like one
    cross-correlation with the *full convolution* A (*) B; channels contract
    over the middle axis. Full convolution is commutative, so we compute it
    as one conv call: treat k_cur as a batch of C_in images with C_mid
    channels, slide the spatially-flipped w_next over them with full pad.
    """
    c_mid, c_in, ah, aw = k_cur.shape
    c_out, c_mid2, bh, bw = w_next.shape
    assert c_mid == c_mid2, (k_cur.shape, w_next.shape)
    lhs = jnp.transpose(k_cur, (1, 0, 2, 3))  # [C_in(batch), C_mid, aH, aW]
    rhs = jnp.flip(w_next, axis=(-2, -1))     # flip => correlation becomes conv
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(bh - 1, bh - 1), (bw - 1, bw - 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )  # [C_in, C_out, aH+bH-1, aW+bW-1]
    return jnp.transpose(out, (1, 0, 2, 3))


def compose_chain(weights: Sequence[jax.Array]) -> jax.Array:
    """Compose a list of OIHW layer weights into the effective kernel.

    Returns [C_out_last, C_in_first, KH, KW] where K = sum(k_i) - n + 1.
    """
    k = weights[0]
    for w in weights[1:]:
        k = compose_pair(w, k)
    return k


def effective_kernel(weights: Sequence[jax.Array]) -> jax.Array:
    """Scalar-I/O chain -> normalized 2-D blur kernel.

    Mean over (C_out, C_in), clamp >= 0, sum-normalize — the exact
    post-processing of `single_kernel/networks.py:150-156`.
    """
    k = compose_chain(weights).mean(axis=(0, 1))
    k = jnp.clip(k, 0.0, None)
    s = jnp.sum(k)
    s = jnp.where(s <= 1e-12, 1.0, s)
    return k / s


def full_conv2d(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full 2-D convolution of two small 2-D kernels (for tests)."""
    return compose_pair(b[None, None], a[None, None])[0, 0]
