"""Multi-band deep-linear degradation generator (KernelGAN-style).

Capability parity with the reference `MultiBandLinearGenerator`
(`single_kernel/networks.py:8-168`): per band an independent bias-free
linear conv chain with kernel sizes [7,5,3,1,1,1] and reflect padding,
Gaussian(sigma=2)/identity/mean initialization, followed by an x8
downsample (three stacked 2x2 avg-pools == one 8x8 block mean).

TPU-first design: instead of a Python loop over bands, the 5 independent
per-band chains run as ONE NHWC grouped-conv chain (feature_group_count =
bands; bit-identical to a per-band loop, and the layout the TPU conv path
prefers). Effective-kernel extraction is the closed-form conv composition
from `ops.kernel_algebra` (one conv call per layer instead of the
reference's O(C^3) Python loop), jittable and differentiable (the
reference's extraction is non-differentiable by construction; we default
to matching that with stop_gradient — see
`extract_kernels(..., differentiable=...)`).

Because the chains are linear, the whole generator is mathematically a
single depthwise conv with the composed 13x13 kernel. `forward_mode=
"compose"` exploits that: compose the per-band kernel on device (tiny,
differentiable) and run ONE depthwise conv — ~230x fewer FLOPs than the
chain, with identical values and gradients everywhere except a
(sum(k)//2 - ...) = 6-pixel border rim where per-layer reflect padding
and pad-once-compose differ. Default stays "chain" (reference-exact);
production training uses compose (`--fast-forward` in the train CLI).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.degrade import block_mean
from ..ops.kernel_algebra import compose_chain

DEFAULT_KS = (7, 5, 3, 1, 1, 1)


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    in_ch: int = 5
    mid_ch: int = 32
    ks: Sequence[int] = DEFAULT_KS
    gaussian_sigma: float = 2.0
    factor: int = 8
    forward_mode: str = "chain"  # "chain" (reference-exact) | "compose"
    #   (single depthwise conv with the composed kernel; ~230x fewer FLOPs,
    #   identical away from a 6px border rim)

    @property
    def layer_channels(self) -> list[tuple[int, int]]:
        """(out, in) channel pairs per layer."""
        n = len(self.ks)
        chans = []
        in_c = 1
        for i, _ in enumerate(self.ks):
            out_c = 1 if i == n - 1 else self.mid_ch
            chans.append((out_c, in_c))
            in_c = out_c
        return chans

    @property
    def effective_kernel_size(self) -> int:
        return sum(self.ks) - len(self.ks) + 1  # 13 for the default chain


def gaussian_kernel(size: int, sigma: float, dtype=jnp.float32) -> jax.Array:
    """Centered 2-D Gaussian, sum 1 (init target, `networks.py:48-53`)."""
    coords = jnp.arange(size, dtype=dtype) - (size - 1) * 0.5
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    g = jnp.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def init_generator(cfg: GeneratorConfig = GeneratorConfig()) -> dict:
    """Gaussian/identity/mean init so a fresh generator's effective kernel
    equals the sigma=2 Gaussian (`networks.py:55-81`).

    Returns {"layers": [w_i]} with w_i shaped [band, out, in, k, k].
    """
    layers = []
    chans = cfg.layer_channels
    n = len(cfg.ks)
    for i, (k, (out_c, in_c)) in enumerate(zip(cfg.ks, chans)):
        if i == 0:
            g = gaussian_kernel(k, cfg.gaussian_sigma)
            w = jnp.broadcast_to(g, (cfg.in_ch, out_c, in_c, k, k))
        elif i == n - 1:
            w = jnp.full((cfg.in_ch, out_c, in_c, k, k), 1.0 / cfg.mid_ch)
        else:
            eye = jnp.zeros((out_c, in_c, k, k))
            idx = min(out_c, in_c)
            eye = eye.at[jnp.arange(idx), jnp.arange(idx), k // 2, k // 2].set(1.0)
            w = jnp.broadcast_to(eye, (cfg.in_ch, out_c, in_c, k, k))
        layers.append(jnp.asarray(w, jnp.float32))
    return {"layers": layers}


def _chain_forward_grouped(layers: Sequence[jax.Array], x: jax.Array) -> jax.Array:
    """All band chains as one NHWC grouped-conv chain (bit-identical to a
    per-band loop). layers: [(band,out,in,k,k)], x: [B,C,H,W] -> [B,C,H,W]."""
    h = jnp.transpose(x, (0, 2, 3, 1))  # NHWC; band-major groups of 1
    for w in layers:
        bands, out_c, in_c, k, _ = w.shape
        if k > 1:
            p = k // 2
            h = jnp.pad(h, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")
        rhs = jnp.transpose(w, (3, 4, 2, 0, 1)).reshape(k, k, in_c, bands * out_c)
        h = jax.lax.conv_general_dilated(
            h, rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=bands,
        )
    return jnp.transpose(h, (0, 3, 1, 2))


def raw_effective_kernels(params: dict) -> jax.Array:
    """Per-band composed chain kernels [C, KH, KW] — RAW (no clip or
    normalization), i.e. exactly the linear map the chain applies."""
    def one_band(ws):
        return compose_chain(list(ws))[0, 0]

    return jax.vmap(one_band)(tuple(params["layers"]))


def _compose_forward(params: dict, x: jax.Array) -> jax.Array:
    """Single depthwise conv with the composed kernel (reflect pad once).
    Values/gradients identical to the chain except a 6px border rim."""
    ks = raw_effective_kernels(params)  # [C, K, K]
    c, ksz, _ = ks.shape
    p = ksz // 2
    h = jnp.transpose(x, (0, 2, 3, 1))
    h = jnp.pad(h, [(0, 0), (p, p), (p, p), (0, 0)], mode="reflect")
    rhs = jnp.transpose(ks, (1, 2, 0))[:, :, None, :]  # HWIO, I=1, O=C
    h = jax.lax.conv_general_dilated(
        h, rhs, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.transpose(h, (0, 3, 1, 2))


def generator_forward(
    params: dict, x: jax.Array, factor: int = 8, forward_mode: str = "chain"
) -> jax.Array:
    """x: [B, C, H, W] -> degraded [B, C, H/factor, W/factor].

    One grouped-conv chain replaces the reference's Python band loop
    (`networks.py:94-106`); `forward_mode="compose"` collapses the linear
    chain into one depthwise conv (see module docstring).
    """
    if forward_mode == "compose":
        y = _compose_forward(params, x)
    else:
        y = _chain_forward_grouped(params["layers"], x)
    return block_mean(y, factor)


def extract_kernels_raw(params: dict) -> jax.Array:
    """Per-band composed kernels WITHOUT clamp/normalize, differentiable.

    The clamped extraction kills gradients at negative entries, so
    nothing in the reference's losses can stop a band's raw kernel from
    drifting all-negative — after clamp+normalize that band's artifact
    is all-zero and the factory degrades it to pure noise (observed
    live in r5 on a D-dominated real_is_lr run). The raw sums feed
    `SingleKernelConfig.raw_sum_reg`, whose gradient reaches every
    weight.
    """
    def one_band(ws):
        return compose_chain(list(ws)).mean(axis=(0, 1))

    return jax.vmap(one_band)(tuple(params["layers"]))


def extract_kernels(params: dict, differentiable: bool = False) -> jax.Array:
    """Per-band effective blur kernels `[C, KH, KW]`, clamped + normalized.

    Default `differentiable=False` reproduces the reference's behavioral
    quirk: extraction runs under no_grad (`networks.py:108`), so the kernel
    regularizer contributes no gradient to G; pass True for the corrected
    differentiable path (framework extension).
    """
    def one_band(ws):
        k = compose_chain(list(ws)).mean(axis=(0, 1))
        k = jnp.clip(k, 0.0, None)
        s = jnp.sum(k)
        s = jnp.where(s <= 1e-12, 1.0, s)
        return k / s

    ks = jax.vmap(one_band)(tuple(params["layers"]))
    return ks if differentiable else jax.lax.stop_gradient(ks)


def extract_merged_kernel(params: dict) -> jax.Array:
    """Cross-band mean kernel `[KH, KW]` (`networks.py:159-168`)."""
    return extract_kernels(params).mean(axis=0)


def generator_weight_stats(params: dict) -> str:
    """First/last-layer weight norms per band chain (`train.py:231-246`)."""
    first, last = params["layers"][0], params["layers"][-1]
    out = []
    for b in range(first.shape[0]):
        n0 = float(jnp.linalg.norm(first[b]))
        nl = float(jnp.linalg.norm(last[b]))
        out.append(f"B{b}(L0n={n0:.3f},Ln={nl:.3f})")
    return " ".join(out)
