"""Whole-scene fused degrade via space-to-depth phase planes.

The patch factory's batch-in-lanes kernel (`degrade_pallas.py`) moves
~15 Gpix/s of input, but a whole Landsat scene (`parallel/spatial.py`)
has no batch to put in lanes: its row-band XLA conv peaked at ~1 Gpix/s
on v5e, and an XLA strided depthwise conv degenerates into an
im2col-style layout copy (SURVEY.md section 5.7; the reference only ever
pre-cuts scenes to patches, `A_00_patch_cutter_universal.py`).

The TPU-first reformulation here removes the stride instead of hiding
it. One XLA space-to-depth pass splits the slab into factor^2 phase
planes

    phases[c, p, q, r, s] = slab[c, f*r + p, f*s + q]

after which the stride-f stencil becomes, per phase (p, q), a tiny
UNSTRIDED window sum: tap (dy, dx) with dy = f*qy + p, dx = f*qx + q
reads phase rows m+qy and cols n+qx, qy/qx in {0..qmax}. Every tap is a
contiguous shifted window of a lane-friendly [R, W/f] plane — no strided
access anywhere.

The `col_split` pre-pass is one extra HBM round-trip of the scene; can
it be folded INTO the stencil's HBM pass? Settled in round 3 (VERDICT
r2 item 8): no — every in-kernel spelling of the column phase split is
rejected by this Mosaic version or loses by construction.
- stride-f lane slice (`lax.slice` strides=(1, f)): lowering verifier
  error, `'vector.extract_strided_slice' op expected strides to be
  confined to [1, 2)`.
- lane-splitting reshape + minor-dim index ([n, W] -> [n, S, f],
  take [..., q]): `infer-vector-layout: unsupported shape cast` on
  `tpu.reshape vector<144x1024xf32> -> vector<144x128x8xf32>`.
- DMA-level split (pass the scene pre-reshaped [C, H, S, f] — free
  metadata change in XLA — and give the grid a q axis whose blocks are
  [rows, S, 1]): lane-strided DMA reads 4 bytes per f*4-byte burst,
  the same ~f-times-copy-speed penalty measured for the tiles layout
  transform (BASELINE.md) — strictly worse than the copy-speed
  pre-pass it would replace.
The two-pass spelling is therefore the roofline choice: the pre-pass
costs ~2 scene-passes of HBM at copy speed (~6 ms of the measured
26 ms/8192^2 scene) while the stencil itself is VPU-fma-bound at
85-90% of its roof.

Three hard-won layout rules (all measured on v5e, 8192^2 scene):
- Never materialize an intermediate whose minor dim is `factor`: lane
  padding inflates it 128/f-fold (21.7 GB compile-time OOM).
- The column deinterleave must be spelled as a LAST-TWO-DIMS swap
  [.., S, f] -> [.., f, S] plus mid-dim permutes (runs at copy speed,
  10.3 ms); the equivalent single 4-D permute (0,3,1,2) runs 4x slower.
- Full-scene `jnp.pad` edge padding runs at ~3x copy cost. There is NO
  per-scene padding here: the blur's half-width offset is folded into a
  statically zero-shifted kernel embedding (`_embed_kernel`), row halos
  ride the halo contract below, and the nb border columns per side are
  finished by tiny strip convs.

Halo contract: `degrade_slab_fast` consumes [C, TOP + Hs + BOT, W] with
(TOP, BOT) = `slab_halo(factor, ksize)` rows of real neighbor content
(sharded) or edge-replicated rows (`extend_rows_edge`, whole scenes).
TOP = f*nb absorbs the half-offset; BOT covers the last tile's
next-block over-read. Both are ~8 rows — a scene-size concat at copy
speed, or a few ppermute rows per shard.

Two backends:
- `_stencil_xla`: jnp windows over the FULL 5-D phase split (CPU parity
  oracle + fallback; XLA re-reads per window offset).
- `_stencil_pallas`: Mosaic kernel over a COLUMN-ONLY phase split
  [C, f(q), H, S] — the single copy-speed pre-pass — handling row
  decimation in-kernel with per-(q,dy) row stacks (Mosaic rejects
  strided sublane slices, so the stacks are spelled as concats of
  static rows). Measured 25% faster end-to-end than a 5-D-phase kernel
  fed by the two-pass split (2.47 vs 1.98 Gpix/s at 8192^2): the row
  mid-permute pass and the large bottom halo both disappear.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: Mosaic sublane-dim blocks must be multiples of 8.
_SUBLANE = 8


def _round_sublane(n: int) -> int:
    return _SUBLANE * (-(-n // _SUBLANE))


def _geometry(factor: int, ksize: int):
    """(half, nb, shift, ke, qmax, sliver) for a composed kernel span."""
    half = (ksize - factor) // 2          # blur half-width
    nb = -(-half // factor) if half else 0  # border cols / halo phase rows
    shift = nb * factor - half            # static zero-shift, in [0, f)
    ke = ksize + shift                    # embedded tap-lattice span
    qmax = (ke - 1) // factor
    sliver = _round_sublane(qmax)
    return half, nb, shift, ke, qmax, sliver


def _next_block(factor: int, ksize: int) -> int:
    """Rows of the Pallas next-block: the kernel's deepest tap reaches
    ksize + shift - factor rows past its main block, rounded to sublanes."""
    shift = _geometry(factor, ksize)[2]
    return _round_sublane(ksize + shift - factor)


def slab_halo(factor: int, ksize: int) -> tuple[int, int]:
    """(top, bottom) extension rows `degrade_slab_fast` expects around a
    slab. Top = f*nb absorbs the blur half-offset; bottom covers the last
    tile's next-block over-read, rounded so top+Hs+bottom stays a factor
    multiple (cheap: a few ppermute rows / edge rows)."""
    half, nb, shift, ke, qmax, _ = _geometry(factor, ksize)
    top = nb * factor
    bot = max(_next_block(factor, ksize) - top, half, 1)
    bot += (-(top + bot)) % factor
    return top, bot


def extend_rows_edge(x: jax.Array, factor: int, ksize: int) -> jax.Array:
    """Edge-replicate TOP/BOT halo rows onto a raw scene (single concat —
    measured at copy speed, unlike full-scene edge `jnp.pad` at ~3x)."""
    top, bot = slab_halo(factor, ksize)
    return jnp.concatenate(
        [
            jnp.repeat(x[:, :1], top, axis=1),
            x,
            jnp.repeat(x[:, -1:], bot, axis=1),
        ],
        axis=1,
    )


def _embed_kernel(comp: jax.Array, factor: int) -> jax.Array:
    """Zero-embed [C, K, K] at offset (shift, shift) in [C, KE, KE] so the
    kernel's tap lattice starts at a phase-aligned row/col."""
    *_, shift, ke, _, _ = _geometry(factor, comp.shape[-1])
    return jnp.pad(
        comp, ((0, 0), (shift, ke - comp.shape[-1] - shift),
               (shift, ke - comp.shape[-1] - shift))
    )


def phase_split(x: jax.Array, factor: int, strategy: str = "transpose") -> jax.Array:
    """[C, H, W] -> [C, f, f, H/f, W/f] phase planes (H, W multiples of f).

    phases[c, p, q, r, s] = x[c, f*r + p, f*s + q].

    - 'transpose': last-two-dims swap [.., S, f] -> [.., f, S] composed
      with mid-dim permutes — copy speed on v5e.
    - 'slices': f strided lane slices + stack (~f-fold read
      amplification; measured 2.7x slower — kept as a fallback oracle).
    """
    c, h, w = x.shape
    if h % factor or w % factor:
        raise ValueError(f"H, W must be multiples of factor: {(h, w, factor)}")
    r, s = h // factor, w // factor
    if strategy == "transpose":
        # cols: [C, H, S, f] (bitcast view) -swap-> [C, H, f, S]
        #       -mid-permute-> [C, f(q), H, S]
        byq = jnp.transpose(
            jnp.swapaxes(x.reshape(c, h, s, factor), 2, 3), (0, 2, 1, 3)
        )
    elif strategy == "slices":
        byq = jnp.stack([x[:, :, q::factor] for q in range(factor)], axis=1)
    else:
        raise ValueError(f"strategy must be transpose|slices, got {strategy!r}")
    # rows: mid-dim permute, minor dim S intact
    return jnp.transpose(byq.reshape(c, factor, r, factor, s), (0, 3, 1, 2, 4))


def _taps(factor: int, ke: int, shift: int):
    """[(p, q, qy, qx, dy, dx)] over the embedded lattice, skipping the
    statically-zero rows/cols below `shift`."""
    qmax = (ke - 1) // factor
    out = []
    for p in range(factor):
        for qy in range(qmax + 1):
            dy = qy * factor + p
            if not (shift <= dy < ke):
                continue
            for q in range(factor):
                for qx in range(qmax + 1):
                    dx = qx * factor + q
                    if not (shift <= dx < ke):
                        continue
                    out.append((p, q, qy, qx, dy, dx))
    return out


def _stencil_xla(
    phases: jax.Array, comp_e: jax.Array, factor: int, shift: int,
    out_h: int, out_w: int,
) -> jax.Array:
    ke = comp_e.shape[-1]
    acc = jnp.zeros((phases.shape[0], out_h, out_w), jnp.float32)
    for p, q, qy, qx, dy, dx in _taps(factor, ke, shift):
        win = phases[:, p, q, qy : qy + out_h, qx : qx + out_w]
        acc = acc + comp_e[:, dy, dx][:, None, None] * win
    return acc


def col_split(x: jax.Array, factor: int) -> jax.Array:
    """[C, H, W] -> [C, f(q), H, S] column phase planes (copy speed):
    byq[c, q, y, s] = x[c, y, f*s + q]."""
    c, h, w = x.shape
    if w % factor:
        raise ValueError(f"W must be a multiple of factor: {(w, factor)}")
    s = w // factor
    return jnp.transpose(
        jnp.swapaxes(x.reshape(c, h, s, factor), 2, 3), (0, 2, 1, 3)
    )


def _colsplit_kernel(
    x_ref, n_ref, k_ref, out_ref, *,
    factor: int, ksize: int, shift: int, rt: int, inner_w: int,
):
    """One (channel, row-tile) block over column-phase planes.

    x_ref [1, f, f*rt, S] main rows + n_ref [1, f, NX, S] next-block
    rows; k_ref [1, C*K*K] (raw, un-embedded kernel) in SMEM. Out row il
    reads input rows f*il + dy + shift — decimation happens here via
    static row stacks (Mosaic has no strided sublane slices), reused
    across the ~K/f column taps sharing the same (q, dy)."""
    k_base = pl.program_id(0) * ksize * ksize
    acc = jnp.zeros((rt, inner_w), jnp.float32)
    for q in range(factor):
        plane = jnp.concatenate([x_ref[0, q], n_ref[0, q]], axis=0)
        for dy in range(ksize):
            rows = None
            for dx in range(ksize):
                if (dx + shift) % factor != q:
                    continue
                if rows is None:
                    start = dy + shift
                    rows = jnp.concatenate(
                        [plane[start + factor * il][None] for il in range(rt)],
                        axis=0,
                    )  # [rt, S]
                qx = (dx + shift) // factor
                kval = k_ref[0, k_base + dy * ksize + dx]
                acc = acc + kval * rows[:, qx : qx + inner_w]
    out_ref[0] = acc


def _pick_tile(out_h: int, factor: int, nx: int, target: int = 16):
    """rows_tile: divides out_h, f*rt a multiple of both 8 (sublane
    blocks) and NX (next-block index granularity) — or None (XLA
    fallback). The raw-path picker with no prev-block constraint."""
    return _pick_tile_raw(out_h, factor, 1, nx, target)


@functools.partial(
    jax.jit,
    static_argnames=("factor", "out_h", "inner_w", "interpret", "tile_target"),
)
def _stencil_pallas_colsplit(
    byq: jax.Array,
    comp: jax.Array,
    factor: int,
    out_h: int,
    inner_w: int,
    interpret: bool = False,
    tile_target: int = 16,
) -> jax.Array:
    c, f, hin, s = byq.shape
    ksize = comp.shape[-1]
    shift = _geometry(factor, ksize)[2]
    nx = _next_block(factor, ksize)
    rt = _pick_tile(out_h, factor, nx, tile_target)
    if rt is None or hin < factor * out_h + nx:
        raise ValueError(
            f"no valid tile for out_h={out_h} (factor {factor}, nx {nx}) "
            f"or slab rows {hin} below the halo contract"
        )
    grid = (c, out_h // rt)
    return pl.pallas_call(
        functools.partial(
            _colsplit_kernel,
            factor=factor, ksize=ksize, shift=shift, rt=rt, inner_w=inner_w,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, f, factor * rt, s),
                lambda ci, ti: (ci, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, nx, s),
                # element offset f*rt*(ti+1), in blocks of NX rows
                lambda ci, ti, _g=(factor * rt): (ci, 0, (ti + 1) * (_g // nx), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c * ksize * ksize),
                lambda ci, ti: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rt, inner_w),
            lambda ci, ti: (ci, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, out_h, inner_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * inner_w * ksize * ksize,
            bytes_accessed=byq.size * byq.dtype.itemsize
            + c * out_h * inner_w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # the default 16 MB scoped-vmem cap is tight for the f-plane
            # blocks; v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(byq, byq, comp.reshape(1, c * ksize * ksize).astype(jnp.float32))


def _border_cols(
    x_ext: jax.Array, comp: jax.Array, factor: int, out_h: int, side: str
) -> jax.Array:
    """The nb border output columns on one side, via a tiny strip conv.

    x_ext rows follow the halo contract; the strip is edge-padded in W
    (cheap: ~K columns) and row-sliced by `shift` so its VALID stride-f
    conv sees exactly the interior kernel's row alignment."""
    from .degrade import depthwise_conv2d

    ksize = comp.shape[-1]
    half, nb, shift, _, _, _ = _geometry(factor, ksize)
    w = x_ext.shape[-1]
    rows = slice(shift, shift + factor * (out_h - 1) + ksize)
    width = factor * (nb - 1) + ksize - half  # columns the border taps reach
    if side == "left":
        strip = x_ext[:, rows, :width]
        strip = jnp.pad(strip, ((0, 0), (0, 0), (half, 0)), mode="edge")
    else:
        strip = x_ext[:, rows, w - width:]
        strip = jnp.pad(strip, ((0, 0), (0, 0), (0, half)), mode="edge")
    return depthwise_conv2d(strip[None], comp, stride=factor)[0]


def halo_rows(factor: int, ksize: int) -> tuple[int, int]:
    """(top, bottom) REAL neighbor rows `degrade_rows_fast` needs: the
    blur half-width above the slab, and the kernel's reach below its last
    stride window. These are the mathematically-minimal halos (6 rows
    each for the production f=8, 13x13-composed case) — what a sharded
    caller must `ppermute`; no slab-sized concat is ever required."""
    half = (ksize - factor) // 2
    return half, max(ksize - half - factor, 0)


def _colsplit_raw_kernel(
    p_ref, x_ref, n_ref, k_ref, out_ref, *,
    factor: int, ksize: int, half: int, pr: int, rt: int, inner_w: int,
):
    """Raw-rows variant of `_colsplit_kernel`: the slab carries NO halo;
    prev/next blocks come from clamped block indices onto the same
    operand (wrong content at the global edges — the host replaces the
    nb top / ceil((K-half-f)/f) bottom output rows with strip convs).

    Row stacks are per-RESIDUE ("base-f"): base[p] stacks plane rows
    f*j + p once per (q, p), and every tap row-set dy is a shifted
    slice of base[(dy - half + pr) % f] — ~2.4x fewer in-kernel row
    concats than one stack per (q, dy) (measured +3% end-to-end)."""
    shift = _geometry(factor, ksize)[2]
    k_base = pl.program_id(0) * ksize * ksize
    acc = jnp.zeros((rt, inner_w), jnp.float32)
    max_start = ksize - 1 - half + pr
    for q in range(factor):
        plane = jnp.concatenate(
            [p_ref[0, q], x_ref[0, q], n_ref[0, q]], axis=0
        )  # [pr + f*rt + nx, S]
        base: dict[int, jax.Array] = {}
        for dy in range(ksize):
            rows = None
            for dx in range(ksize):
                if (dx + shift) % factor != q:
                    continue
                if rows is None:
                    start = dy - half + pr
                    p = start % factor
                    if p not in base:
                        n_p = rt + (max_start - p) // factor
                        base[p] = jnp.concatenate(
                            [plane[factor * j + p][None] for j in range(n_p)],
                            axis=0,
                        )
                    s0 = start // factor
                    rows = base[p][s0 : s0 + rt]  # [rt, S]
                qx = (dx + shift) // factor
                kval = k_ref[0, k_base + dy * ksize + dx]
                acc = acc + kval * rows[:, qx : qx + inner_w]
    out_ref[0] = acc


def _pick_tile_raw(out_h: int, factor: int, pr: int, nx: int,
                   target: int = 16):
    """rows_tile for the raw kernel: divides out_h; f*rt a multiple of
    the sublane block and of the prev/next block-index granularities;
    and rt itself legal as the OUT block's sublane dim (Mosaic requires
    block dims divisible by 8 or equal to the array dim — an rt=1 tile
    over a prime out_h like 127 lowers in interpret mode but is REJECTED
    by the real-TPU lowering; callers take the XLA path on None)."""
    for rt in range(min(target, out_h), 0, -1):
        frt = factor * rt
        if out_h % rt == 0 and frt % _SUBLANE == 0 \
                and frt % pr == 0 and frt % nx == 0 \
                and (rt % _SUBLANE == 0 or rt == out_h):
            return rt
    return None


@functools.partial(
    jax.jit,
    static_argnames=("factor", "inner_w", "interpret", "tile_target"),
)
def _stencil_pallas_raw(
    byq: jax.Array,
    comp: jax.Array,
    factor: int,
    inner_w: int,
    interpret: bool = False,
    tile_target: int = 16,
) -> jax.Array:
    """Pallas stencil over a raw (halo-free) column phase split
    [C, f, H, S] -> [C, H/f, inner_w]. Global-edge output rows are
    contaminated (clamped prev/next blocks) — callers must overwrite
    them (`degrade_rows_fast` does)."""
    c, f, hin, s = byq.shape
    ksize = comp.shape[-1]
    half = (ksize - factor) // 2
    pr = _round_sublane(max(half, 1))
    nx = _round_sublane(max(ksize - half - factor, 1))
    out_h = hin // factor
    rt = _pick_tile_raw(out_h, factor, pr, nx, tile_target)
    if rt is None or hin % factor or hin < max(pr, nx):
        raise ValueError(
            f"no legal raw tiling: rows {hin}, factor {factor}, "
            f"pr {pr}, nx {nx}"
        )
    n_prev_blocks = hin // pr
    n_next_blocks = hin // nx
    grid = (c, out_h // rt)
    frt = factor * rt
    return pl.pallas_call(
        functools.partial(
            _colsplit_raw_kernel,
            factor=factor, ksize=ksize, half=half, pr=pr, rt=rt,
            inner_w=inner_w,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, f, pr, s),
                # the pr rows above the main block, clamped at the top
                lambda ci, ti, _g=frt // pr, _n=n_prev_blocks: (
                    ci, 0, jnp.clip(ti * _g - 1, 0, _n - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, frt, s),
                lambda ci, ti: (ci, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, nx, s),
                # the nx rows below the main block, clamped at the bottom
                lambda ci, ti, _g=frt // nx, _n=n_next_blocks: (
                    ci, 0, jnp.minimum((ti + 1) * _g, _n - 1), 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c * ksize * ksize),
                lambda ci, ti: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rt, inner_w),
            lambda ci, ti: (ci, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, out_h, inner_w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * inner_w * ksize * ksize,
            bytes_accessed=byq.size * byq.dtype.itemsize
            + c * out_h * inner_w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # clamped (non-affine) block indices revisit blocks at the
            # edges: the grid's minor axis must stay "arbitrary"
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(byq, byq, byq, comp.reshape(1, c * ksize * ksize).astype(jnp.float32))


def _row_band(
    x: jax.Array, top_rows: jax.Array, bot_rows: jax.Array,
    comp: jax.Array, factor: int, side: str, n_rows: int,
) -> jax.Array:
    """The n_rows top/bottom output rows via a thin full-width strip conv
    (rows from the REAL halo + the slab; W edge-padded by `half`)."""
    from .degrade import depthwise_conv2d

    ksize = comp.shape[-1]
    half = (ksize - factor) // 2
    h = x.shape[1]
    if side == "top":
        strip = jnp.concatenate(
            [top_rows, x[:, : factor * (n_rows - 1) + ksize - half]], axis=1
        )
    else:
        strip = jnp.concatenate(
            [x[:, h - factor * n_rows - half:], bot_rows], axis=1
        )
    strip = jnp.pad(strip, ((0, 0), (0, 0), (half, half)), mode="edge")
    return depthwise_conv2d(strip[None], comp, stride=factor)[0]


def _border_cols_raw(
    x: jax.Array, top_rows: jax.Array, bot_rows: jax.Array,
    comp: jax.Array, factor: int, side: str,
) -> jax.Array:
    """The nb border output columns on one side for the raw-rows path:
    a thin column strip assembled from the real halos (no shift
    gymnastics — the strip is exactly the oracle's padded geometry)."""
    from .degrade import depthwise_conv2d

    ksize = comp.shape[-1]
    half, nb, *_ = _geometry(factor, ksize)
    w = x.shape[-1]
    width = factor * (nb - 1) + ksize - half  # columns the border taps reach
    cols = slice(0, width) if side == "left" else slice(w - width, w)
    strip = jnp.concatenate(
        [top_rows[:, :, cols], x[:, :, cols], bot_rows[:, :, cols]], axis=1
    )
    wpad = (half, 0) if side == "left" else (0, half)
    strip = jnp.pad(strip, ((0, 0), (0, 0), wpad), mode="edge")
    return depthwise_conv2d(strip[None], comp, stride=factor)[0]


def degrade_rows_fast(
    x: jax.Array,
    comp: jax.Array,
    factor: int,
    top_rows: jax.Array,
    bot_rows: jax.Array,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Degrade a RAW row slab given thin real halos — no slab-sized halo
    concat anywhere (the committed `degrade_slab_fast` contract costs one
    full extra HBM pass for the [top | slab | bot] assembly; measured
    ~12 ms at 8192^2, ~25% of the whole scene pass).

    x: [C, Hs, W] (Hs, W multiples of `factor`); top_rows/bot_rows:
    [C, >=halo_rows()[0], W] / [C, >=halo_rows()[1], W] of neighbor
    (sharded) or edge-replicated (global edge) content; comp: [C, K, K].
    Returns [C, Hs/f, W/f], numerically identical to replicate-pad +
    `depthwise_conv2d(..., stride=factor)` on the composed kernel.

    The Pallas path reads the slab's column phase split exactly once:
    interior rows via `_stencil_pallas_raw` (clamped prev/next blocks),
    the nb/ceil((K-half-f)/f) edge output rows and nb border columns via
    thin strip convs over the real halos.
    """
    c, h, w = x.shape
    ksize = comp.shape[-1]
    half, nb, shift, ke, qmax, _ = _geometry(factor, ksize)
    th, bh = halo_rows(factor, ksize)
    if h % factor or w % factor:
        raise ValueError(f"slab dims must be factor multiples: {(h, w)}")
    if top_rows.shape[1] < th or bot_rows.shape[1] < bh:
        raise ValueError(
            f"halos too thin: need ({th}, {bh}), "
            f"got ({top_rows.shape[1]}, {bot_rows.shape[1]})"
        )
    top_rows = top_rows[:, top_rows.shape[1] - th:]
    bot_rows = bot_rows[:, :bh]
    out_h, out_w = h // factor, w // factor
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl not in ("pallas", "xla"):
        raise ValueError(f"impl must be auto|pallas|xla, got {impl!r}")
    if qmax > 2 * nb:
        raise ValueError(
            f"kernel span {ksize} too wide for factor {factor} "
            f"(qmax {qmax} > 2*nb {2 * nb}); use ops.degrade instead"
        )
    if impl == "pallas":
        pr = _round_sublane(max(half, 1))
        nx = _round_sublane(max(bh, 1))
        n_top_req = nb
        n_bot_req = -(-bh // factor)
        if (half < 1 or bh < 1 or h < max(pr, nx)
                or _pick_tile_raw(out_h, factor, pr, nx) is None
                # the edge-row strip convs reach this deep into the slab;
                # a thinner slab would under-run them (and an out_h below
                # the two bands would mis-assemble) — take the XLA path,
                # which handles thin slabs correctly
                or h < factor * (n_top_req - 1) + ksize - half
                or h < factor * n_bot_req + half
                or out_h < n_top_req + n_bot_req):
            impl = "xla"
    if impl == "xla":
        # adapter to the extended-slab contract: the shift top rows and
        # the trailing bottom rows are multiplied only by the embedded
        # kernel's zero taps — edge content keeps them finite
        top_ext, bot_ext = slab_halo(factor, ksize)
        parts = [
            jnp.repeat(top_rows[:, :1] if th else x[:, :1], shift, axis=1),
            top_rows, x, bot_rows,
            jnp.repeat(
                bot_rows[:, -1:] if bh else x[:, -1:], bot_ext - bh, axis=1
            ),
        ]
        x_ext = jnp.concatenate([p for p in parts if p.shape[1]], axis=1)
        return degrade_slab_fast(x_ext, comp, factor, impl="xla")

    inner_w = out_w - 2 * nb
    inner = _stencil_pallas_raw(
        col_split(x, factor), comp, factor, inner_w, interpret=interpret
    )
    n_top = nb
    n_bot = -(-bh // factor)
    left = _border_cols_raw(x, top_rows, bot_rows, comp, factor, "left")
    right = _border_cols_raw(x, top_rows, bot_rows, comp, factor, "right")
    rows_mid = slice(n_top, out_h - n_bot if n_bot else out_h)
    mid = jnp.concatenate(
        [left[:, rows_mid], inner[:, rows_mid], right[:, rows_mid]], axis=-1
    )
    bands = []
    if n_top:
        bands.append(
            _row_band(x, top_rows, bot_rows, comp, factor, "top", n_top)
        )
    bands.append(mid)
    if n_bot:
        bands.append(
            _row_band(x, top_rows, bot_rows, comp, factor, "bottom", n_bot)
        )
    return jnp.concatenate(bands, axis=1) if len(bands) > 1 else bands[0]


def degrade_slab_fast(
    x_ext: jax.Array,
    comp: jax.Array,
    factor: int,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """Degrade a halo-extended slab with the composed blur-box kernel.

    x_ext: [C, TOP + Hs + BOT, W] with (TOP, BOT) = `slab_halo` rows of
    neighbor/edge content and W a multiple of `factor` (columns raw —
    global column edges are finished internally via strip convs).
    comp: [C, K, K]. Returns [C, Hs/f, W/f], numerically identical to
    replicate-pad + `depthwise_conv2d(..., stride=factor)`.

    impl: 'auto' (Pallas on accelerators, XLA phases on CPU), 'pallas',
    or 'xla'.
    """
    c, hin, w = x_ext.shape
    ksize = comp.shape[-1]
    half, nb, shift, ke, qmax, sliver = _geometry(factor, ksize)
    top, bot = slab_halo(factor, ksize)
    out_h = (hin - top - bot) // factor
    out_w = w // factor
    if (hin - top - bot) % factor or w % factor:
        raise ValueError(
            f"slab rows/cols must fit the halo contract: {(hin, w, top, bot)}"
        )
    if impl == "auto":
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl not in ("pallas", "xla"):
        raise ValueError(f"impl must be auto|pallas|xla, got {impl!r}")
    if qmax > 2 * nb:
        # interior windows would over-read the phase planes' last columns
        raise ValueError(
            f"kernel span {ksize} too wide for factor {factor} "
            f"(qmax {qmax} > 2*nb {2 * nb}); use ops.degrade instead"
        )

    inner_w = out_w - 2 * nb
    if impl == "pallas":
        nx = _next_block(factor, ksize)
        if _pick_tile(out_h, factor, nx) is None or hin < factor * out_h + nx:
            impl = "xla"  # no legal tiling for this shape
    if impl == "pallas":
        inner = _stencil_pallas_colsplit(
            col_split(x_ext, factor), comp, factor, out_h, inner_w,
            interpret=interpret,
        )
    else:
        if nb + bot // factor < qmax:
            raise ValueError(
                f"halo {top}+{bot} too thin for row windows (qmax {qmax})"
            )
        comp_e = _embed_kernel(comp, factor)
        phases = phase_split(x_ext, factor)
        inner = _stencil_xla(phases, comp_e, factor, shift, out_h, inner_w)
    left = _border_cols(x_ext, comp, factor, out_h, "left")
    right = _border_cols(x_ext, comp, factor, out_h, "right")
    return jnp.concatenate([left, inner, right], axis=-1)
