"""Fused Pallas TPU kernel for the degradation data factory.

One kernel performs: 13x13 per-band blur (composed with the x`factor` box
mean into a single (13+f-1)^2 stride-f stencil) + optional noise-pool
injection — the op the reference spells as replicate-pad -> grouped conv
-> three avg-pools -> add noise (`C_30apply_kernel_to_landsat.py:107-123`,
`E_make_train_data.py:65-74`), here executed in a single pass over VMEM.

Layout strategy (the TPU-first part): batch lives in the LANE dimension.
Inputs are `[C, Hp, Wp, B]` so every one of the 400 stencil taps is a
full-width VPU fma over 128+ batch elements, instead of the 8x8 output
tile a per-image layout would vectorize over. The padded image rows are
viewed as `[y_outer, 8, x_outer, 8, B]` so a stride-8 stencil tap becomes
a contiguous static slice — no strided gathers.

`degrade_pallas` wraps the kernel with the NCHW<->CHWB transposes and
replicate padding; `degrade_pallas_chwb` is the zero-transpose production
path for pipelines that keep the factory layout end-to-end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .degrade import compose_with_box, normalize_kernel

LANE = 128


def _degrade_kernel(x_ref, k_ref, out_ref, *, factor: int, ksize: int, out_h: int, out_w: int):
    """Phase-split stencil, one row-phase (dyi) slab per grid step.

    Grid: (C, B/Bt, factor); the dyi axis is innermost, and the output
    block is REVISITED across its `factor` steps (accumulated in VMEM),
    which keeps each pipelined x block small enough to multi-buffer.

    x_ref: [1, 1, f, Yo, Xo, Bt] — the dyi slab; each (dxi) plane is a
    contiguous [Yo, Xo, Bt] slab, so every tap is a cheap shifted window
    (sublane roll at worst), never a strided gather.
    k_ref: [1, C*ksize*ksize] composed kernels in SMEM.
    out: [1, out_h, out_w, Bt], accumulated across dyi steps.

    Out-of-kernel taps are masked with a zero coefficient (~44% extra fma
    for f=8, k=20; still far under the VPU win from contiguous windows).
    """
    n_o = (ksize + factor - 1) // factor
    bt = x_ref.shape[-1]
    dyi = pl.program_id(2)
    k_base = pl.program_id(0) * (n_o * factor) ** 2

    @pl.when(dyi == 0)
    def _():
        out_ref[0] = jnp.zeros((out_h, out_w, bt), jnp.float32)

    acc = jnp.zeros((out_h, out_w, bt), jnp.float32)
    kside = n_o * factor  # kernel zero-padded to the full tap lattice
    for dxi in range(factor):
        plane = x_ref[0, 0, dxi]  # [Yo, Xo, Bt], static index
        for dxo in range(n_o):
            window = plane[:, dxo : dxo + out_w, :]
            dx = dxo * factor + dxi
            for dyo in range(n_o):
                dy = dyo * factor + dyi
                kval = k_ref[0, k_base + dy * kside + dx]
                acc = acc + kval * window[dyo : dyo + out_h]
    out_ref[0] = out_ref[0] + acc


def _degrade_noise_kernel(x_ref, k_ref, n_ref, out_ref, *, factor: int, **kw):
    _degrade_kernel(x_ref, k_ref, out_ref, factor=factor, **kw)

    @pl.when(pl.program_id(2) == factor - 1)
    def _():
        out_ref[0] = out_ref[0] + n_ref[0]


@functools.partial(
    jax.jit, static_argnames=("factor", "batch_tile", "interpret")
)
def degrade_pallas_chwb(
    x: jax.Array,
    kernel: jax.Array,
    noise: jax.Array | None = None,
    factor: int = 8,
    batch_tile: int = LANE,
    interpret: bool = False,
) -> jax.Array:
    """Fused degrade on factory-layout data.

    x: [C, H, W, B] (unpadded); kernel: [C, kh, kw] (normalized per band
    inside); noise: optional [C, H/f, W/f, B] added to the output.
    Returns [C, H/f, W/f, B].
    """
    c, h, w, b = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    assert b % batch_tile == 0, (b, batch_tile)
    comp = compose_with_box(normalize_kernel(kernel), factor)  # [C, K, K]
    ksize = comp.shape[-1]
    kside = (-(-ksize // factor)) * factor  # tap lattice side (zero-padded)
    kh_half = kernel.shape[-1] // 2
    out_h, out_w = h // factor, w // factor

    # Replicate-pad by the blur half-width, then zero-pad up to a multiple
    # of `factor` so the kernel can view rows as [y_outer, factor, ...].
    # y_outer must cover both the padded image and the deepest tap slice
    # (dyo + out_h with dyo up to ceil(ksize/factor) - 1).
    n_dyo = (ksize + factor - 1) // factor
    y_outer = max(-(-(h + 2 * kh_half) // factor), out_h + n_dyo - 1)
    x_outer = max(-(-(w + 2 * kh_half) // factor), out_w + n_dyo - 1)
    yp = y_outer * factor
    xp = x_outer * factor
    x_pad = jnp.pad(
        x,
        ((0, 0), (kh_half, kh_half), (kh_half, kh_half), (0, 0)),
        mode="edge",
    )
    x_pad = jnp.pad(
        x_pad,
        ((0, 0), (0, yp - h - 2 * kh_half), (0, xp - w - 2 * kh_half), (0, 0)),
    )
    # Phase-split: [C, Yp, Xp, B] -> [C, f, f, Yo, Xo, B] (one XLA transpose
    # at HBM speed; inside the kernel each (dyi, dxi) plane is contiguous).
    x_ph = x_pad.reshape(c, y_outer, factor, x_outer, factor, b)
    x_ph = jnp.transpose(x_ph, (0, 2, 4, 1, 3, 5))

    grid = (c, b // batch_tile, factor)
    in_specs = [
        pl.BlockSpec(
            (1, 1, factor, y_outer, x_outer, batch_tile),
            lambda ci, bi, p: (ci, p, 0, 0, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, c * kside * kside),
            lambda ci, bi, p: (0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    comp_pad = jnp.pad(
        comp, ((0, 0), (0, kside - ksize), (0, kside - ksize))
    )
    operands = [x_ph, comp_pad.reshape(1, c * kside * kside)]
    kern = _degrade_kernel
    if noise is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, out_h, out_w, batch_tile),
                lambda ci, bi, p: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(noise)
        kern = _degrade_noise_kernel

    bytes_touched = x_pad.size * 4 + c * out_h * out_w * b * 4
    return pl.pallas_call(
        functools.partial(
            kern, factor=factor, ksize=ksize, out_h=out_h, out_w=out_w
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, out_h, out_w, batch_tile),
            lambda ci, bi, p: (ci, 0, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, out_h, out_w, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * out_w * b * ksize * ksize,
            bytes_accessed=bytes_touched,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("factor", "interpret"))
def degrade_pallas(
    img: jax.Array,
    kernel: jax.Array,
    noise: jax.Array | None = None,
    factor: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """NCHW convenience wrapper: img [B, C, H, W], kernel [C, kh, kw] or
    [kh, kw], optional noise [B, C, H/f, W/f]. Returns [B, C, H/f, W/f].

    Pads the batch up to a lane multiple and transposes to the factory
    layout around the fused kernel.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    b, c, h, w = img.shape
    if kernel.ndim == 2:
        kernel = jnp.broadcast_to(kernel[None], (c, *kernel.shape))
    b_pad = ((b + LANE - 1) // LANE) * LANE
    x = jnp.transpose(img, (1, 2, 3, 0))
    if b_pad != b:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, b_pad - b)))
    n = None
    if noise is not None:
        n = jnp.transpose(noise, (1, 2, 3, 0))
        if b_pad != b:
            n = jnp.pad(n, ((0, 0), (0, 0), (0, 0), (0, b_pad - b)))
    out = degrade_pallas_chwb(
        x, kernel, noise=n, factor=factor, interpret=interpret
    )
    out = jnp.transpose(out, (3, 0, 1, 2))[:b]
    return out[0] if squeeze else out
