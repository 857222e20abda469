"""Fused Pallas TPU kernel for the degradation data factory.

One kernel performs: 13x13 per-band blur (composed with the x`factor` box
mean into a single (13+f-1)^2 stride-f stencil) + optional noise-pool
injection — the op the reference spells as replicate-pad -> grouped conv
-> three avg-pools -> add noise (`C_30apply_kernel_to_landsat.py:107-123`,
`E_make_train_data.py:65-74`), here executed in a single pass over VMEM.

Layout strategy (the TPU-first part): batch lives in the LANE dimension.
Inputs are `[C, H, W, B]` so every stencil tap is a full-width VPU fma
over 128+ batch elements, instead of the 8x8 output tile a per-image
layout would vectorize over.

Four generations, selectable via `version` (None = auto):

- v1/v2: an XLA pre-pass replicate-pads and phase-splits the input so
  every stride-f tap is a contiguous slice. Measured on v5e the
  edge-mode pad alone runs at ~3x a pure copy (sublane-hostile W+2*pad
  extents) and dominates end-to-end time. v1 additionally re-streams
  the input f times (row phase on the grid); v2 reads it once.
- v4 (default only for spans > 5*factor where the lattice is
  unavailable): the WHOLE stencil — permutation, clamped replicate
  padding, every composed tap — folded into one dense
  [out_h*out_w, h*w] matrix per channel and applied as
  magnitude-pruned 3-term bf16-split MXU matmuls (6 passes f32 / 3
  passes bf16 input; `_stencil_matrix`, `_degrade_kernel_v4`). Dense
  wastes ~10x the sparse FLOPs but rides the MXU: 2.75x v2 at factor 4
  (1.25 vs 0.46M patches/s on chip; a 5-pass x-2-term spelling adds
  only ~5% — the path is not pass-bound). Measured SLOWER than v3's
  VPU lattice everywhere both apply (1.25 vs 2.89M at factor 4, 2.95
  vs 3.26M at factor 8) — kept as the any-span fallback.
- v3 (default when the composed span fits 5*factor): fully fused —
  consumes the RAW unpadded block, performs the column phase split
  in-kernel as MXU matmuls with a [W, W] permutation matrix, realizes
  replicate padding as statically clamped tap indices (|q| <= 2 block
  overhang for spans in (3f, 5f], e.g. the MoE factor-4 route's span
  16: 2.89M patches/s, ~86% of the dense lattice's 3.36M VPU fma
  roof), and vectorizes taps over all output rows. The input crosses
  HBM exactly once in its natural layout. The permutation matmul runs
  as 3 single-pass matmuls over exact bf16 term splits of the f32 rows
  (`_permute_row`) instead of one 6-pass HIGHEST matmul: 4.84M degraded
  64^2 patches/s/chip on v5e (+23% over HIGHEST; 97x the 50k/s
  target), and the fused-noise variant rides the same pass.

`degrade_pallas` wraps the kernel with the NCHW<->CHWB transposes;
`degrade_pallas_chwb` is the zero-transpose production path for
pipelines that keep the factory layout end-to-end.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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
        if plane.dtype != jnp.float32:  # bf16 input storage: upcast in VMEM
            plane = plane.astype(jnp.float32)
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


def _degrade_kernel_v2(
    x_ref, k_ref, out_ref, *, factor: int, ksize: int, out_h: int, out_w: int
):
    """All-phases variant: grid (C, B/Bt) only; one invocation consumes the
    full [f, f, Yo, Xo, Bt] phase block and emits the finished output tile.

    v1 put the row phase (dyi) on the grid, which re-streamed the whole
    input f times from HBM (each dyi step loads all f dxi planes) — v1's
    cost is f x input bytes. Here the input crosses HBM exactly once;
    measured ~2.3x faster at f=8 on v5e.
    """
    n_o = (ksize + factor - 1) // factor
    bt = x_ref.shape[-1]
    kside = n_o * factor
    k_base = pl.program_id(0) * kside * kside
    acc = jnp.zeros((out_h, out_w, bt), jnp.float32)
    for dyi in range(factor):
        for dxi in range(factor):
            plane = x_ref[0, dyi, dxi]  # [Yo, Xo, Bt], static index
            if plane.dtype != jnp.float32:  # bf16 storage: upcast in VMEM
                plane = plane.astype(jnp.float32)
            for dxo in range(n_o):
                window = plane[:, dxo : dxo + out_w, :]
                dx = dxo * factor + dxi
                for dyo in range(n_o):
                    dy = dyo * factor + dyi
                    kval = k_ref[0, k_base + dy * kside + dx]
                    acc = acc + kval * window[dyo : dyo + out_h]
    out_ref[0] = acc


def _degrade_noise_kernel_v2(x_ref, k_ref, n_ref, out_ref, **kw):
    _degrade_kernel_v2(x_ref, k_ref, out_ref, **kw)
    out_ref[0] = out_ref[0] + n_ref[0]


def _permute_row(p_mat, x_row, perm_mode: str):
    """One column-permutation matmul row, [W, Bt] -> [W, Bt] f32.

    A 0/1 permutation matmul SELECTS one input per output — there is no
    accumulation — so splitting the f32 operand into exact bf16 terms
    (x = hi + mid + lo, each term exactly representable) and summing
    single-pass DEFAULT matmuls reproduces the permutation with no MXU
    rounding of the terms themselves:
      - 'split3': 3 one-pass matmuls, residual <= 2^-24 |x| (f32-exact);
      - 'split2': 2 one-pass matmuls, residual <= 2^-16 |x| (~1.5e-5
        rel — inside the 1e-3 factory parity budget);
      - 'highest': the original 6-pass HIGHEST f32 matmul (bit-exact).
    bf16-stored inputs take ONE exact pass regardless of mode (the old
    path upcast to f32 then paid all 6 HIGHEST passes for 8-bit data).
    """
    dims = (((1,), (0,)), ((), ()))
    if x_row.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            p_mat, x_row, dims, preferred_element_type=jnp.float32
        )
    if perm_mode == "highest":
        return jax.lax.dot_general(
            p_mat, x_row, dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    hi = x_row.astype(jnp.bfloat16)
    r = x_row - hi.astype(jnp.float32)
    terms = [hi]
    if perm_mode == "split3":
        mid = r.astype(jnp.bfloat16)
        r = r - mid.astype(jnp.float32)
        terms.append(mid)
    terms.append(r.astype(jnp.bfloat16))
    out = None
    for t in terms:
        d = jax.lax.dot_general(
            p_mat, t, dims, preferred_element_type=jnp.float32
        )
        out = d if out is None else out + d
    return out


def _col_halo(ksize: int, factor: int) -> int:
    """Column/row block over-reach of the composed stencil: the halo
    depth m such that every tap's block offset q (columns) / q0 (rows)
    satisfies |q| <= m. m = 1 for spans <= 3*factor (the factor-8
    production case, span 20 <= 24), m = 2 for spans <= 5*factor (the
    MoE factor-4 route, span 16 <= 20: `muti_kernel/train_gemini.py:134`
    decimates by 4, so the 13-tap blur composes to span 16 > 3*4)."""
    half = (ksize - factor) // 2
    return max(
        (half + factor - 1) // factor, (ksize - 1 - half) // factor, 1
    )


def _shift_cols(base, left, right, q: int, out_w: int):
    """Column tap at block offset q with replicate clamping: overhang
    columns (|q| deep at the edges) all clamp to image col 0 / W-1 —
    x_col = f*(j+q) + r < 0 clamps to 0 for every overhang j."""
    if q == 0:
        return base
    if q < 0:
        return jnp.concatenate([*([left] * -q), base[:, : out_w + q]], axis=1)
    return jnp.concatenate([base[:, q:], *([right] * q)], axis=1)


def _tap_lattice(rows_of, k_ref, k_base, *, factor: int, ksize: int,
                 w: int, out_h: int, out_w: int, bt: int):
    """The composed-stencil VPU fma lattice shared by v3 and the
    pre-split variant. `rows_of(p, q0)` returns the [out_h, W, Bt] slab
    of phase-`p` rows starting at row-block q0 (with the replicate halo
    at each end already materialized by the caller's layout, m =
    `_col_halo` rows deep).

    Vectorizes over output ROWS: every (dy, dx) tap is ONE fma over the
    whole [out_h, out_w, Bt] output tile. Fully static addressing (a
    fori_loop over dy with dynamic row loads measured 2.2x slower; a
    per-(i,dy,dx) unroll matched this speed but compiled 5x slower).

    Column taps at block offset q != 0 materialize their clamped edge
    columns with a concat. A padded-column variant (each phase block
    stored out_w + 2m wide with the clamped edge columns BAKED so every
    tap is a single static slice) was tried and REJECTED: the
    arbitrary-offset sublane slices it needs measured ~27% SLOWER than
    the aligned-base concats at f=4 (2.10 vs 2.89M patches/s) and
    dragged f=8 to 3.16M — Mosaic handles aligned block reads + small
    copies better than unaligned windows.
    """
    half = (ksize - factor) // 2  # blur half-width (composed kernel)
    acc = jnp.zeros((out_h, out_w, bt), jnp.float32)
    for dy in range(ksize):
        q0, p = divmod(dy - half, factor)
        stacked = rows_of(p, q0)                # [out_h, W, Bt]
        left = stacked[:, 0:1]                  # image col 0   (v = 0)
        right = stacked[:, w - 1 : w]           # image col W-1 (v = W-1)
        for dx in range(ksize):
            q, r = divmod(dx - half, factor)
            kval = k_ref[0, k_base + dy * ksize + dx]
            base = stacked[:, r * out_w : (r + 1) * out_w]
            acc = acc + kval * _shift_cols(base, left, right, q, out_w)
    return acc


def _degrade_kernel_v3(
    x_ref, p_ref, k_ref, out_ref, xp_ref, *,
    factor: int, ksize: int, h: int, w: int, out_h: int, out_w: int,
    perm_mode: str = "highest",
):
    """Fully-fused variant: consumes the RAW unpadded [H, W, Bt] block.

    v1/v2 rely on an XLA pre-pass for replicate padding and the column
    phase split; measured on v5e the edge-mode pad alone costs ~3x a pure
    copy (bad sublane layout at W+2*pad), dominating the pipeline. Here
    both disappear into the kernel:

    - column phase split = ONE in-kernel einsum with a [W, W] permutation
      matrix (an MXU matmul, ~1% of the kernel's cycles), giving
      xp[y, dxi*out_w + xo, b] with each phase's columns contiguous in
      sublanes;
    - replicate padding = statically CLAMPED tap indices: row taps clamp
      to rows 0 / H-1 at compile time (zero extra ops), and the two
      column-overhang cases (q = -1 at j=0, q = +1 at j=out_w-1) read the
      first/last image column directly.

    The input crosses HBM exactly once with its natural layout.
    """
    bt = x_ref.shape[-1]
    m = _col_halo(ksize, factor)
    # MXU pass per row: permute columns w -> (w % f) * out_w + (w // f).
    # A naive DEFAULT pass would round the image through bf16 (measured
    # 5e-3 abs err vs the 1e-3 factory parity budget); HIGHEST is exact
    # but pays 6 MXU passes. `_permute_row` cuts that to 2-3 exact
    # bf16-term passes (or 1 for bf16-stored inputs).
    p_mat = p_ref[...]
    # The scratch is ROW-PHASE-SPLIT: xp_ref[p, m + y//f] holds permuted
    # image row y (p = y % f), with m replicate halo rows at each end of
    # the j axis (every overhang row clamps to image row 0 / h-1). Every
    # tap dy then reads its out_h source rows (strided f apart in image
    # space) as ONE contiguous [out_h, W', Bt] slice, replacing a per-dy
    # jnp.stack of clamped rows (interleaved A/B: +2% — Mosaic scheduled
    # the static stacks well, but the slice is free and the addressing
    # simpler).
    for row in range(h):
        # bf16 input storage is consumed directly by the single-pass
        # permutation (upcast happens in the f32 accumulate; an
        # unconditional f32->f32 astype measured a 22% slowdown —
        # Mosaic emits a real copy for it, so gate dtype at trace time)
        xp_ref[row % factor, m + row // factor] = _permute_row(
            p_mat, x_ref[0, row], perm_mode
        )
    for p in range(factor):
        # replicate halos: y < 0 clamps to image row 0, y > h-1 to h-1
        for hm in range(m):
            xp_ref[p, hm] = xp_ref[0, m]
            xp_ref[p, out_h + m + hm] = xp_ref[
                (h - 1) % factor, m + (h - 1) // factor
            ]
    k_base = pl.program_id(0) * ksize * ksize
    out_ref[0] = _tap_lattice(
        lambda p, q0: xp_ref[p, q0 + m : q0 + m + out_h],
        k_ref, k_base,
        factor=factor, ksize=ksize, w=w, out_h=out_h, out_w=out_w, bt=bt,
    )


def _degrade_noise_kernel_v3(x_ref, p_ref, k_ref, n_ref, out_ref, xp_ref, **kw):
    _degrade_kernel_v3(x_ref, p_ref, k_ref, out_ref, xp_ref, **kw)
    out_ref[0] = out_ref[0] + n_ref[0]


def _degrade_kernel_v3ps(
    x_ref, k_ref, out_ref, *,
    factor: int, ksize: int, w: int, out_h: int, out_w: int,
):
    """Pre-split variant: the input arrives in the PHASE-SPLIT layout
    v3 builds in its scratch — [f, out_h+2, W, Bt] per channel, columns
    permuted to v = (x % f)*out_w + x//f and ONE replicate halo row at
    each end of the row axis — so the kernel is the bare tap lattice:
    no permutation matmuls, no scratch, no halo writes. The layout is
    produced for free by the native loader (it writes gathered batches
    in whatever order, `runtime/csrc/patch_loader.cpp`) or once per
    pool by `phase_split_chwb`.

    bf16-stored inputs are consumed directly: each tap's fma promotes to
    the f32 accumulator (no explicit astype — an unconditional copy
    measured a 22% slowdown, see NOTES_r2)."""
    bt = x_ref.shape[-1]
    m = _col_halo(ksize, factor)
    k_base = pl.program_id(0) * ksize * ksize
    out_ref[0] = _tap_lattice(
        lambda p, q0: x_ref[0, p, q0 + m : q0 + m + out_h],
        k_ref, k_base,
        factor=factor, ksize=ksize, w=w, out_h=out_h, out_w=out_w, bt=bt,
    )


def _degrade_noise_kernel_v3ps(x_ref, k_ref, n_ref, out_ref, **kw):
    _degrade_kernel_v3ps(x_ref, k_ref, out_ref, **kw)
    out_ref[0] = out_ref[0] + n_ref[0]


def _degrade_kernel_v3psn(
    x_ref, k_ref, out_ref, *,
    factor: int, ksize: int, w: int, out_h: int, out_w: int,
):
    """HALO-FREE pre-split variant: x_ref[0] is [f, out_h, W, Bt] — the
    v3ps layout minus the two baked replicate rows per phase, so the
    input crosses HBM with EXACTLY the natural layout's byte count
    (the baked rows cost +(2/out_h) bytes: +25% at 64^2/f=8, measured
    to outweigh the permutation matmuls they replace — NOTES_r2).

    Replicate row padding is reconstructed in-kernel: taps whose row
    block q0 = -1/+1 over-reach the plane by exactly ONE row (the
    clamped image row 0 / H-1, which lives at phase 0 / f-1). Each such
    edge dy materializes its halo row with one leading-dim concat
    ([1|out_h-1] rows), then the tap runs unsplit — ~1 tile copy per
    edge dy vs the 400-tap fma lattice (~1% overhead), and bit-exact vs
    `degrade_pallas_chwb` (same per-element (dy, dx) accumulation
    order). A slice-update spelling that avoids the concats was tried
    and REJECTED: Mosaic has no TPU lowering for scatter-add
    (`.at[o:o+n].add`) nor for value-domain `lax.dynamic_slice`, and a
    segmented-accumulator spelling buys at most the ~1% copy cost back
    at 3x the tap instruction count."""
    bt = x_ref.shape[-1]
    half = (ksize - factor) // 2
    k_base = pl.program_id(0) * ksize * ksize
    acc = jnp.zeros((out_h, out_w, bt), jnp.float32)
    top_row = x_ref[0, 0, 0:1]                         # image row 0
    bot_row = x_ref[0, factor - 1, out_h - 1 : out_h]  # image row H-1

    def col_taps(acc, stacked, dy):
        left = stacked[:, 0:1]
        right = stacked[:, w - 1 : w]
        for dx in range(ksize):
            q, r = divmod(dx - half, factor)
            kval = k_ref[0, k_base + dy * ksize + dx]
            base = stacked[:, r * out_w : (r + 1) * out_w]
            acc = acc + kval * _shift_cols(base, left, right, q, out_w)
        return acc

    for dy in range(ksize):
        q0, p = divmod(dy - half, factor)
        plane = x_ref[0, p]  # [out_h, W, Bt]
        # overhang rows all clamp to image row 0 / H-1 (|q0| deep)
        if q0 == 0:
            rows = plane
        elif q0 < 0:
            rows = jnp.concatenate(
                [*([top_row] * -q0), plane[: out_h + q0]], axis=0
            )
        else:
            rows = jnp.concatenate(
                [plane[q0:], *([bot_row] * q0)], axis=0
            )
        acc = col_taps(acc, rows, dy)
    out_ref[0] = acc


def _degrade_noise_kernel_v3psn(x_ref, k_ref, n_ref, out_ref, **kw):
    _degrade_kernel_v3psn(x_ref, k_ref, out_ref, **kw)
    out_ref[0] = out_ref[0] + n_ref[0]


@functools.partial(jax.jit, static_argnames=("factor", "halo", "halo_rows"))
def phase_split_chwb(
    x: jax.Array, factor: int = 8, halo: bool = True, halo_rows: int = 1
) -> jax.Array:
    """[C, H, W, B] -> the pre-split degrade layout
    [C, f, H/f + 2*halo_rows, W, B]: rows regrouped by row-phase
    p = y % f, columns permuted to v = (x % f)*(W/f) + x//f (each column
    phase contiguous), plus `halo_rows` replicate halo rows per end (all
    clamping to image rows 0 / H-1) so every stride-f tap of the
    composed stencil is a contiguous slice. halo_rows must be
    `_col_halo(ksize, factor)` for the kernel span to be degraded
    (1 for spans <= 3*factor, e.g. 13-tap blur at factor 8; 2 for the
    factor-4 MoE route's span 16).

    halo=False drops the baked halo rows -> [C, f, H/f, W, B]: the SAME
    byte count as the natural CHWB layout (the baked rows cost
    (H/f + 2)/(H/f) more input bytes — +25% at 64^2/f=8, the measured
    reason the baked-halo presplit route LOST to natural v3). The
    matching kernel (`_degrade_kernel_v3psn`) reconstructs the replicate
    padding from clamped in-kernel rows instead.

    All moved dims are middle/sublane dims (the lane dim B is untouched),
    so XLA lowers this at copy speed (NOTES_r2: swap-last-two + mid
    permutes run at copy speed; minor-dim splits lane-pad 128/f-fold).
    """
    c, h, w, b = x.shape
    if h % factor or w % factor:
        raise ValueError(f"H, W must be multiples of factor: {(h, w, factor)}")
    out_h, out_w = h // factor, w // factor
    xr = x.reshape(c, out_h, factor, out_w, factor, b)
    xp = jnp.transpose(xr, (0, 2, 1, 4, 3, 5)).reshape(c, factor, out_h, w, b)
    if not halo:
        return xp
    top = jnp.broadcast_to(xp[:, 0:1, 0:1], (c, factor, halo_rows, w, b))
    bot = jnp.broadcast_to(
        xp[:, factor - 1 : factor, out_h - 1 : out_h],
        (c, factor, halo_rows, w, b),
    )
    return jnp.concatenate([top, xp, bot], axis=2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "factor", "batch_tile", "interpret", "baked_halo", "halo_rows",
    ),
)
def degrade_pallas_presplit(
    xp: jax.Array,
    kernel: jax.Array,
    noise: jax.Array | None = None,
    factor: int = 8,
    batch_tile: int | None = None,
    interpret: bool = False,
    baked_halo: bool = True,
    halo_rows: int | None = None,
) -> jax.Array:
    """Fused degrade on PRE-SPLIT factory data (see `phase_split_chwb`).

    xp: [C, f, H/f + 2, W, B] phase-split with baked halo rows — or,
    with baked_halo=False, [C, f, H/f, W, B] without them (the
    `phase_split_chwb(halo=False)` layout: natural-layout byte count;
    replicate padding reconstructed in-kernel by
    `_degrade_kernel_v3psn`). kernel:
    [C, kh, kw]; noise: optional [C, H/f, W/f, B]. Returns
    [C, H/f, W/f, B], identical to `degrade_pallas_chwb` on the
    un-split input (same composed stencil, same clamped-tap replicate
    padding).

    This is the bandwidth-roof path: v3 spends its non-lattice cycles on
    the in-kernel column-permutation matmuls and scratch traffic; here
    the layout work happened upstream (native loader / one-time pool
    split), so the kernel is the pure 400-tap VPU lattice. Baked halo
    rows cost (f + 2)/f more input bytes at H=64/f=8 (+25% — measured
    to cost MORE than the permutation matmuls they save, which is why
    baked_halo=False exists).

    halo_rows: with baked_halo=True, the halo depth the layout was built
    with (`phase_split_chwb(..., halo_rows=...)`). The kernel cannot
    infer this from the array shape alone — it derives the required
    depth m from the composed kernel span, and a layout built with a
    DIFFERENT depth would silently misinterpret real rows as halo rows.
    Pass it whenever you control the split so a mismatch raises instead.
    """
    c, f, hrows, w, b = xp.shape
    if f != factor:
        raise ValueError(f"xp phase dim {f} != factor {factor}")
    out_w = w // factor
    if w % factor:
        raise ValueError(f"W must be a multiple of factor: {(w, factor)}")
    if batch_tile is None:
        batch_tile = (
            2 * LANE
            if (b % (2 * LANE) == 0 and hrows * factor * w <= 80 * 64)
            else LANE
        )
    if b % batch_tile:
        raise ValueError(f"batch {b} must be a multiple of batch_tile {batch_tile}")
    if kernel.shape[-1] != kernel.shape[-2]:
        raise ValueError(
            f"the fused kernels assume square blur kernels, got "
            f"{kernel.shape[-2]}x{kernel.shape[-1]} (use ops.degrade instead)"
        )
    comp = compose_with_box(normalize_kernel(kernel), factor)  # [C, K, K]
    ksize = comp.shape[-1]
    if ksize > 5 * factor:
        raise ValueError(
            f"pre-split degrade supports kernel span <= 5*factor, got "
            f"{ksize} > {5 * factor}"
        )
    m = _col_halo(ksize, factor)
    if baked_halo and halo_rows is not None and halo_rows != m:
        raise ValueError(
            f"presplit layout was built with halo_rows={halo_rows} but the "
            f"composed span {ksize} at factor {factor} needs halo depth "
            f"m={m}; rebuild with phase_split_chwb(..., halo_rows={m}) "
            f"(or use baked_halo=False, which needs no halo rows)"
        )
    if not baked_halo and halo_rows not in (None, 0):
        raise ValueError(
            f"baked_halo=False expects a halo-free layout "
            f"(phase_split_chwb(halo=False)); got halo_rows={halo_rows}"
        )
    out_h = hrows - 2 * m if baked_halo else hrows
    if out_h < 1:
        raise ValueError(
            f"presplit layout has {hrows} row-blocks but the composed span "
            f"{ksize} implies {2 * m} halo rows — no image rows remain "
            f"(layout/kernel mismatch?)"
        )
    grid = (c, b // batch_tile)
    in_specs = [
        pl.BlockSpec(
            (1, factor, hrows, w, batch_tile),
            lambda ci, bi: (ci, 0, 0, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, c * ksize * ksize),
            lambda ci, bi: (0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    operands = [xp, comp.reshape(1, c * ksize * ksize)]
    if baked_halo:
        kern = _degrade_kernel_v3ps
        kern_noise = _degrade_noise_kernel_v3ps
    else:
        kern = _degrade_kernel_v3psn
        kern_noise = _degrade_noise_kernel_v3psn
    if noise is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, out_h, out_w, batch_tile),
                lambda ci, bi: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(noise)
        kern = kern_noise
    return pl.pallas_call(
        functools.partial(
            kern, factor=factor, ksize=ksize, w=w, out_h=out_h, out_w=out_w,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, out_h, out_w, batch_tile),
            lambda ci, bi: (ci, 0, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, out_h, out_w, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * out_w * b * ksize * ksize,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + c * out_h * out_w * b * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # default 16 MB scoped-vmem cap binds at batch_tile>=256
            # (v5e has 128 MB of VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def _bf16_terms(a: jax.Array, n: int) -> list:
    """Split a float32 array into n bf16 terms, a ≈ sum(terms): term i
    carries mantissa bits [8i, 8i+8); the residual after n terms is
    <= 2^-8n relative. Exact-in-bf16 inputs come back as [a, 0, ...].

    The split is computed by MANTISSA MASKING (bitcast + and), NOT by
    `r - r.astype(bf16).astype(f32)` convert roundtrips: XLA on TPU
    folds the f32->bf16->f32 roundtrip to identity, which silently
    zeroes every residual term — measured on hardware as a 7.5e-4 max
    rel error in v4 (the kernel ran on bf16(A) alone) while interpret
    mode and CPU jit reproduce the intended split exactly
    (scripts/tpu_parity.py finding). Masked truncation keeps each
    masked term exactly bf16-representable (sign + exp + 7 mantissa
    bits) and each subtraction exact in f32; only the LAST term's store
    can round (the remainder after k maskings holds up to 24-7k bits),
    bounding the n=3 partition residual at ~2^-22 |a| — well inside the
    pruned-pass budget."""
    terms = []
    r = a
    for i in range(n):
        if i == n - 1:
            t = r
        else:
            t = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(r, jnp.uint32)
                & np.uint32(0xFFFF0000),
                jnp.float32,
            )
        terms.append(t.astype(jnp.bfloat16))
        r = r - t
    return terms


def _degrade_kernel_v4(x_ref, a_ref, out_ref, *,
                       h: int, w: int, out_h: int, out_w: int,
                       x_terms: int = 3):
    """Whole-stencil-as-matmul variant: one [out_h*out_w, h*w] matrix A
    per channel encodes ALL of v3's work — the column permutation, the
    statically-clamped replicate padding, and the full composed tap
    lattice — as a dense MXU contraction over the flattened block:

        out[i*out_w + j, b] = sum_p A[i*out_w + j, p] * x[p, b]

    Dense wastes ~10x the FLOPs of the sparse 400-tap lattice, but buys
    them back on the MXU (vs the VPU fma lattice) and removes the
    per-row permutation loop entirely. Precision: A arrives pre-split
    into THREE exact bf16 terms (a_ref[0, i] carries mantissa bits
    [8i, 8i+8)); x is split likewise in-kernel, and all term products
    with combined weight 2^-8(i+j), i+j <= 2 are accumulated (6 MXU
    passes for f32 x, 3 for bf16-stored x). Two-term splits measured
    1.2e-3 max rel ON HARDWARE (the h*w-long contraction amplifies the
    2^-17 split residual ~sqrt(h*w)-fold; interpret mode hides this by
    computing in f32) — three terms bound the dropped i+j=3 products
    at ~2^-24*sqrt(h*w) ~ 4e-6.
    """
    bt = x_ref.shape[-1]
    x = x_ref[0].reshape(h * w, bt)
    # x_terms=3: full 6-pass exact spelling (~4e-6 max rel on chip);
    # x_terms=2: 5 passes — the dropped A0*x_lo2 product carries the
    # 2^-16-level x partition residual through the contraction
    xs = [x] if x.dtype == jnp.bfloat16 else _bf16_terms(x, x_terms)
    dims = (((1,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )

    acc = None
    for i in range(3):
        for j in range(len(xs)):
            if i + j > 2:
                continue
            d = dot(a_ref[0, i], xs[j])
            acc = d if acc is None else acc + d
    out_ref[0] = acc.reshape(out_h, out_w, bt)


def _degrade_noise_kernel_v4(x_ref, a_ref, n_ref, out_ref, **kw):
    _degrade_kernel_v4(x_ref, a_ref, out_ref, **kw)
    out_ref[0] = out_ref[0] + n_ref[0]


def _stencil_matrix(comp: jax.Array, factor: int, h: int, w: int) -> jax.Array:
    """[C, out_h*out_w, h*w] dense stencil matrix: A[o, y*w + x] sums the
    composed-kernel taps that read input pixel (y, x) for output o, with
    replicate padding folded in as clamped (duplicate, scatter-added)
    indices. Index arrays are static; the scatter-add runs under jit so
    traced kernels work."""
    c, ksize, _ = comp.shape
    half = (ksize - factor) // 2
    out_h, out_w = h // factor, w // factor
    rows, cols, kidx = [], [], []
    for i in range(out_h):
        for j in range(out_w):
            for dy in range(ksize):
                y = min(max(factor * i + dy - half, 0), h - 1)
                for dx in range(ksize):
                    x = min(max(factor * j + dx - half, 0), w - 1)
                    rows.append(i * out_w + j)
                    cols.append(y * w + x)
                    kidx.append(dy * ksize + dx)
    flat = np.asarray(rows, np.int32) * (h * w) + np.asarray(cols, np.int32)
    a = jnp.zeros((c, out_h * out_w * h * w), jnp.float32)
    a = a.at[:, flat].add(comp.reshape(c, -1)[:, np.asarray(kidx, np.int32)])
    return a.reshape(c, out_h * out_w, h * w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "factor", "batch_tile", "interpret", "version", "perm_mode",
        "v4_x_terms",
    ),
)
def degrade_pallas_chwb(
    x: jax.Array,
    kernel: jax.Array,
    noise: jax.Array | None = None,
    factor: int = 8,
    batch_tile: int | None = None,
    interpret: bool = False,
    version: int | None = None,
    perm_mode: str = "split3",
    v4_x_terms: int = 3,
) -> jax.Array:
    """Fused degrade on factory-layout data.

    x: [C, H, W, B] (unpadded); kernel: [C, kh, kw] (normalized per band
    inside); noise: optional [C, H/f, W/f, B] added to the output.
    Returns [C, H/f, W/f, B].

    batch_tile=None auto-selects: 2 lanes (256) when the batch divides and
    the input tile stays small (measured +9% over 128 at 64^2/f=8 — fewer
    grid steps pipeline better; 512 adds nothing), else 1 lane (128).

    version=None auto-selects: the pad-free v3 kernel (4.84M 64^2
    patches/s/chip on v5e — vs the v1/v2 route, which pays an XLA
    edge-pad + phase-split pre-pass at ~3x copy cost) whenever the
    composed kernel span fits 5*factor (the |q| <= 2 extended tap
    lattice covers spans in (3f, 5f], e.g. the MoE factor-4 route);
    the dense-MXU v4 for wider spans when its layout constraints hold
    (2.75x v2 at factor 4); else v2.

    perm_mode (v3 only) sets the in-kernel column-permutation matmul's
    precision/passes trade: 'split3' (default, f32-exact, 3 one-pass
    bf16-term matmuls), 'split2' (~1.5e-5 rel residual, 2 passes), or
    'highest' (bit-exact 6-pass f32 matmul). See `_permute_row`.
    """
    c, h, w, b = x.shape
    if batch_tile is None:
        batch_tile = 2 * LANE if (b % (2 * LANE) == 0 and h * w <= 64 * 64) else LANE
    if h % factor or w % factor:
        raise ValueError(f"H, W must be multiples of factor: {(h, w, factor)}")
    if b % batch_tile:
        raise ValueError(f"batch {b} must be a multiple of batch_tile {batch_tile}")
    if kernel.shape[-1] != kernel.shape[-2]:
        raise ValueError(
            f"the fused kernels assume square blur kernels, got "
            f"{kernel.shape[-2]}x{kernel.shape[-1]} (use ops.degrade instead)"
        )
    comp = compose_with_box(normalize_kernel(kernel), factor)  # [C, K, K]
    ksize = comp.shape[-1]
    kside = (-(-ksize // factor)) * factor  # tap lattice side (zero-padded)
    kh_half = kernel.shape[-1] // 2
    out_h, out_w = h // factor, w // factor

    # flattening [h, w, bt] -> [h*w, bt] (and [out_hw] -> [out_h, out_w])
    # is layout-free only on sublane-tile multiples — 8 for f32, 16 for
    # bf16-stored inputs (the (16, 128) bf16 tile); the dense A must
    # also fit VMEM comfortably
    w_tile = 16 if x.dtype == jnp.bfloat16 else 8
    v4_ok = not (
        w % w_tile or out_w % 8 or out_h * out_w * h * w > 64 * 64 * 64 * 8
    )
    if version is None:
        if ksize <= 5 * factor:
            # VPU tap lattice; the |q| <= 2 extension covers the MoE
            # factor-4 route (span 16): 2.89M patches/s on v5e — 2.3x
            # the dense-MXU v4 (1.25M) and ~86% of the 3.36M VPU fma
            # roof for the 256-tap exact dense stencil (scripts/ab_f4)
            version = 3
        elif v4_ok:
            version = 4       # dense MXU stencil: any span, 2.75x v2
        else:
            version = 2
    if version not in (1, 2, 3, 4):
        raise ValueError(f"version must be 1..4 or None, got {version!r}")
    if version == 4:
        if not v4_ok:
            raise ValueError(
                f"v4 needs w, w//factor multiples of 8 and a VMEM-sized "
                f"stencil matrix; got h={h}, w={w}, factor={factor}"
            )
        a = _stencil_matrix(comp, factor, h, w)
        # three exact bf16 terms stacked on one axis (see _degrade_kernel_v4)
        a_terms = jnp.stack(_bf16_terms(a, 3), axis=1)  # [C, 3, out_hw, h*w]
        out_hw = out_h * out_w
        grid = (c, b // batch_tile)
        in_specs = [
            pl.BlockSpec(
                (1, h, w, batch_tile),
                lambda ci, bi: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 3, out_hw, h * w),
                lambda ci, bi: (ci, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        operands = [x, a_terms]
        kern = _degrade_kernel_v4
        if noise is not None:
            in_specs.append(
                pl.BlockSpec(
                    (1, out_h, out_w, batch_tile),
                    lambda ci, bi: (ci, 0, 0, bi),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(noise)
            kern = _degrade_noise_kernel_v4
        return pl.pallas_call(
            functools.partial(
                kern, h=h, w=w, out_h=out_h, out_w=out_w,
                x_terms=v4_x_terms,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_h, out_w, batch_tile),
                lambda ci, bi: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((c, out_h, out_w, b), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=(3 if x.dtype == jnp.bfloat16 else 6)
                * 2 * c * out_hw * h * w * b,
                bytes_accessed=x.size * x.dtype.itemsize
                + c * out_hw * b * 4 + a_terms.size * 2,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                # default 16 MB scoped-vmem cap binds at batch_tile>=256
                # (v5e has 128 MB of VMEM)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*operands)
    if version == 3:
        if ksize > 5 * factor:
            raise ValueError(
                f"v3 supports kernel span <= 5*factor, got {ksize} > {5 * factor}"
            )
        m_halo = _col_halo(ksize, factor)
        if perm_mode not in ("split2", "split3", "highest"):
            raise ValueError(
                f"perm_mode must be split2|split3|highest, got {perm_mode!r}"
            )
        # column-permutation matrix: v = (w % f) * out_w + (w // f);
        # 0/1 entries are exact in bf16, which the split modes (and any
        # bf16-stored input) consume in single MXU passes
        perm = np.zeros((w, w), np.float32)
        for wi in range(w):
            perm[(wi % factor) * out_w + wi // factor, wi] = 1.0
        p_dtype = (
            jnp.float32
            if perm_mode == "highest" and x.dtype == jnp.float32
            else jnp.bfloat16
        )
        grid = (c, b // batch_tile)
        in_specs = [
            pl.BlockSpec(
                (1, h, w, batch_tile),
                lambda ci, bi: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((w, w), lambda ci, bi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, c * ksize * ksize),
                lambda ci, bi: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        operands = [
            x, jnp.asarray(perm, p_dtype), comp.reshape(1, c * ksize * ksize)
        ]
        kern = _degrade_kernel_v3
        if noise is not None:
            in_specs.append(
                pl.BlockSpec(
                    (1, out_h, out_w, batch_tile),
                    lambda ci, bi: (ci, 0, 0, bi),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(noise)
            kern = _degrade_noise_kernel_v3
        return pl.pallas_call(
            functools.partial(
                kern, factor=factor, ksize=ksize, h=h, w=w,
                out_h=out_h, out_w=out_w, perm_mode=perm_mode,
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, out_h, out_w, batch_tile),
                lambda ci, bi: (ci, 0, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (factor, h // factor + 2 * m_halo, w, batch_tile),
                    jnp.float32,
                )
            ],
            out_shape=jax.ShapeDtypeStruct((c, out_h, out_w, b), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * c * out_h * out_w * b * ksize * ksize,
                bytes_accessed=x.size * x.dtype.itemsize + c * out_h * out_w * b * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                # default 16 MB scoped-vmem cap binds at batch_tile>=256
                # (v5e has 128 MB of VMEM)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*operands)

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

    comp_pad = jnp.pad(
        comp, ((0, 0), (0, kside - ksize), (0, kside - ksize))
    )
    operands = [x_ph, comp_pad.reshape(1, c * kside * kside)]
    if version == 2:
        # all phases per block: input crosses HBM once (see kernel docstring)
        grid = (c, b // batch_tile)
        in_specs = [
            pl.BlockSpec(
                (1, factor, factor, y_outer, x_outer, batch_tile),
                lambda ci, bi: (ci, 0, 0, 0, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c * kside * kside),
                lambda ci, bi: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ]
        out_spec = pl.BlockSpec(
            (1, out_h, out_w, batch_tile),
            lambda ci, bi: (ci, 0, 0, bi),
            memory_space=pltpu.VMEM,
        )
        kern = _degrade_kernel_v2
        noise_kern = _degrade_noise_kernel_v2
        semantics = ("parallel", "parallel")
    else:
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
        out_spec = pl.BlockSpec(
            (1, out_h, out_w, batch_tile),
            lambda ci, bi, p: (ci, 0, 0, bi),
            memory_space=pltpu.VMEM,
        )
        kern = _degrade_kernel
        noise_kern = _degrade_noise_kernel
        semantics = ("parallel", "parallel", "arbitrary")
    if noise is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, out_h, out_w, batch_tile),
                (lambda ci, bi: (ci, 0, 0, bi)) if version == 2
                else (lambda ci, bi, p: (ci, 0, 0, bi)),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(noise)
        kern = noise_kern

    bytes_touched = x_pad.size * x_pad.dtype.itemsize + c * out_h * out_w * b * 4
    return pl.pallas_call(
        functools.partial(
            kern, factor=factor, ksize=ksize, out_h=out_h, out_w=out_w
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((c, out_h, out_w, b), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * out_w * b * ksize * ksize,
            bytes_accessed=bytes_touched,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics,
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
