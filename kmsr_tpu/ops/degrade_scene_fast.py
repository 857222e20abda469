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


def _geometry(factor: int, ksize: int):
    """(half, nb, shift, ke, qmax, sliver) for a composed kernel span."""
    half = (ksize - factor) // 2          # blur half-width
    nb = -(-half // factor) if half else 0  # border cols / halo phase rows
    shift = nb * factor - half            # static zero-shift, in [0, f)
    ke = ksize + shift                    # embedded tap-lattice span
    qmax = (ke - 1) // factor
    sliver = _SUBLANE * (-(-qmax // _SUBLANE))
    return half, nb, shift, ke, qmax, sliver


def _next_block(factor: int, ksize: int) -> int:
    """Rows of the Pallas next-block: the kernel's deepest tap reaches
    ksize + shift - factor rows past its main block, rounded to sublanes."""
    shift = _geometry(factor, ksize)[2]
    return _SUBLANE * (-(-(ksize + shift - factor) // _SUBLANE))


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
    fallback)."""
    for rt in range(min(target, out_h), 0, -1):
        if out_h % rt == 0 and (factor * rt) % _SUBLANE == 0 \
                and (factor * rt) % nx == 0:
            return rt
    return None


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
