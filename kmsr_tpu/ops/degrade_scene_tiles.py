"""Whole-scene fused degrade with COLUMN TILES IN LANES.

The raw-slab scene path (`degrade_scene_fast.degrade_rows_fast`) keeps
the scene's W in the lane dimension, so every column tap whose phase
offset qx != 0 reads a lane-misaligned window — Mosaic inserts lane
rolls, and the kernel pass runs ~5x slower per input byte than the patch
factory's batch-in-lanes kernel (where ALL shifts live in sublanes).

This module restores the patch kernel's alignment for scenes: the scene
is cut into T = W/Wt column tiles and the TILE index goes to lanes,

    ext[c, p, i, f + dxi*out_wt + j, t] = x[c, f*i + p, Wt*t + f*j + dxi]

i.e. each tile is pre-phase-split exactly like
`degrade_pallas.phase_split_chwb` patches (columns permuted so each
column phase is contiguous in sublanes), with the tile's f TRUE
neighbor columns per side baked into the sublane axis:

    sublanes = [ hl(f) | tile columns (Wt) | hr(f) ]
    hl[r] = scene col Wt*t - f + r   (prev tile; replicate at t = 0)
    hr[r] = scene col Wt*(t+1) + r   (next tile; replicate at t = T-1)

so tile-boundary output columns are EXACT — no border strip convs, no
clamped block indices, a fully parallel grid. Row halos ride two thin
side arrays (`_prev_next_rows`: one presplit row per row-tile) whose
first/last entries carry the replicate content for the global edges —
no top/bottom strip convs either. The whole scene pass is then:

    one XLA transform pass (transposes fused into a single write)
    one Mosaic pass of the pure tap lattice (every operand lane-aligned)
    one 21 MB inverse swap of the output

The reference has no whole-scene path at all (scenes are pre-cut to
256^2 patches, `A_00_patch_cutter_universal.py:126-197`); this and
`degrade_scene_fast` are the TPU-first answer to SURVEY.md section 5.7.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_SUBLANE = 8


def scene_to_tiles_ext(x: jax.Array, factor: int, wt: int) -> jax.Array:
    """[C, H, W] -> [C, f, H/f, 2f + Wt, W/Wt] extended tile layout (see
    module docstring).

    Built as a chain of the measured copy-speed layout moves (NOTES_r2):
    reshape + swap-last-two twice, then a mid permute — every
    materializable intermediate keeps the minor dim at S or T (lane
    sized). A single 6-D reshape+transpose spelling of the same map OOMs
    at compile for full scenes: XLA materializes the reshape whose minor
    dim is `factor`, lane-padding it 128/f-fold (21.5 GB at 8192^2).
    The column halos are slices of the same intermediate, so the whole
    transform is one fused chain with no strided gathers."""
    c, h, w = x.shape
    if h % factor or w % wt or wt % factor:
        raise ValueError(f"need H%f==0, W%Wt==0, Wt%f==0: {(h, w, wt, factor)}")
    f = factor
    t, out_h, out_wt = w // wt, h // factor, wt // factor
    # [C, H, S, f] -> swap -> [C, H, f(r), S]: column-residue split.
    z = jnp.swapaxes(x.reshape(c, h, w // f, f), 2, 3)
    # S -> (T, out_wt) -> swap -> [C, H, f(r), out_wt(j), T]: tiles to lanes.
    z = jnp.swapaxes(z.reshape(c, h, f, t, out_wt), 3, 4)
    # H -> (out_h, f(p)); p out front (mid permute, minor untouched):
    # z[c, p, i, r, j, t] = x[c, f*i + p, t*Wt + f*j + r].
    z = jnp.transpose(z.reshape(c, out_h, f, f, out_wt, t), (0, 2, 1, 3, 4, 5))
    tiles = z.reshape(c, f, out_h, wt, t)
    rep_l = jnp.broadcast_to(
        tiles[:, :, :, 0:1, 0:1], (c, f, out_h, f, 1)
    )
    rep_r = jnp.broadcast_to(
        tiles[:, :, :, wt - 1 : wt, t - 1 : t], (c, f, out_h, f, 1)
    )
    if t > 1:
        # hl[., r, ti] = scene col Wt*ti - f + r = z[..., r, out_wt-1, ti-1]
        hl = jnp.concatenate([rep_l, z[:, :, :, :, out_wt - 1, : t - 1]],
                             axis=-1)
        # hr[., r, ti] = scene col Wt*(ti+1) + r = z[..., r, 0, ti+1]
        hr = jnp.concatenate([z[:, :, :, :, 0, 1:], rep_r], axis=-1)
    else:
        hl, hr = rep_l, rep_r
    return jnp.concatenate([hl, tiles, hr], axis=3)


def rows_to_tiles_ext(rows: jax.Array, factor: int, wt: int) -> jax.Array:
    """Column-only version of `scene_to_tiles_ext` for THIN row halos:
    [C, n, W] -> [C, n, 2f + Wt, W/Wt] (each given row permuted into the
    extended tile layout; no row-phase grouping)."""
    c, n, w = rows.shape
    if w % wt or wt % factor:
        raise ValueError(f"need W%Wt==0, Wt%f==0: {(w, wt, factor)}")
    t, out_wt = w // wt, wt // factor
    body = rows.reshape(c, n, t, out_wt, factor)
    body = jnp.transpose(body, (0, 1, 4, 3, 2)).reshape(c, n, wt, t)
    rep_l = jnp.broadcast_to(body[:, :, 0:1, 0:1], (c, n, factor, 1))
    rep_r = jnp.broadcast_to(
        body[:, :, wt - 1 : wt, t - 1 : t], (c, n, factor, 1)
    )
    if t > 1:
        l = rows[:, :, wt - factor : w - factor].reshape(c, n, t - 1, wt)[
            ..., :factor
        ]
        hl = jnp.concatenate([rep_l, jnp.transpose(l, (0, 1, 3, 2))], axis=-1)
        r = rows[:, :, wt:].reshape(c, n, t - 1, wt)[..., :factor]
        hr = jnp.concatenate([jnp.transpose(r, (0, 1, 3, 2)), rep_r], axis=-1)
    else:
        hl, hr = rep_l, rep_r
    return jnp.concatenate([hl, body, hr], axis=2)


def _prev_next_rows(ext: jax.Array, factor: int, rt: int):
    """Thin row-halo arrays [C, f, out_h/rt, 2f+Wt, T]: entry ti holds
    presplit row (p, ti*rt - 1) / (p, ti*rt + rt), with the global-edge
    entries carrying the replicate rows (permuted image row 0 / H-1) so
    the kernel needs no clamping and no edge fixups."""
    c, f, out_h, we, t = ext.shape
    n = out_h // rt
    rep_top = jnp.broadcast_to(ext[:, 0:1, 0:1], (c, f, 1, we, t))
    rep_bot = jnp.broadcast_to(
        ext[:, f - 1 : f, out_h - 1 : out_h], (c, f, 1, we, t)
    )
    prev = jnp.concatenate([rep_top, ext[:, :, rt - 1 :: rt][:, :, : n - 1]],
                           axis=2)
    nxt = jnp.concatenate([ext[:, :, rt::rt], rep_bot], axis=2)
    return prev, nxt


def _degrade_kernel_tiles(
    xm_ref, xp_ref, xn_ref, k_ref, out_ref, *,
    factor: int, ksize: int, wt: int, out_wt: int, rt: int,
):
    """Pure tap lattice over one (channel, row-tile, lane-tile) block.

    xm_ref [1, f, rt, 2f+Wt, Bt] main rows; xp_ref/xn_ref
    [1, f, 1, 2f+Wt, Bt] the single presplit row above/below the block
    (replicate content at the global edges). Every tap operand is a
    SUBLANE slice — tiles live in lanes, so no lane rolls anywhere.
    """
    half = (ksize - factor) // 2
    bt = xm_ref.shape[-1]
    k_base = pl.program_id(0) * ksize * ksize
    acc = jnp.zeros((rt, out_wt, bt), jnp.float32)
    for dy in range(ksize):
        q0, p = divmod(dy - half, factor)
        if q0 == 0:
            stacked = xm_ref[0, p]                      # [rt, 2f+Wt, Bt]
        elif q0 == -1:
            # rt == 1 gates the empty xm slice at trace time (Pallas
            # rejects zero-length slices)
            stacked = xp_ref[0, p] if rt == 1 else jnp.concatenate(
                [xp_ref[0, p], xm_ref[0, p, : rt - 1]], axis=0
            )
        elif q0 == 1:
            stacked = xn_ref[0, p] if rt == 1 else jnp.concatenate(
                [xm_ref[0, p, 1:], xn_ref[0, p]], axis=0
            )
        else:
            raise NotImplementedError(
                f"kernel span {ksize} > 3*factor {factor}"
            )
        for dx in range(ksize):
            q, r = divmod(dx - half, factor)
            kval = k_ref[0, k_base + dy * ksize + dx]
            base = stacked[:, factor + r * out_wt : factor + (r + 1) * out_wt]
            if q == 0:
                shifted = base
            elif q == -1:  # j=0 reads the baked hl column of residue r
                shifted = jnp.concatenate(
                    [stacked[:, r : r + 1], base[:, : out_wt - 1]], axis=1
                )
            elif q == 1:   # j=out_wt-1 reads the baked hr column
                shifted = jnp.concatenate(
                    [base[:, 1:],
                     stacked[:, factor + wt + r : factor + wt + r + 1]],
                    axis=1,
                )
            else:
                raise NotImplementedError(
                    f"kernel span {ksize} > 3*factor {factor}"
                )
            acc = acc + kval * shifted
    out_ref[0] = acc


def _pick_rt(out_h: int, target: int = 64) -> int | None:
    """Largest row-tile <= target dividing out_h (sublane-friendly)."""
    for rt in range(min(target, out_h), 0, -1):
        if out_h % rt == 0:
            return rt
    return None


def pick_wt(w: int, factor: int, target: int = 64) -> int | None:
    """Largest tile width <= target dividing W: a multiple of `factor`
    with at least two output columns per tile (out_wt == 1 would leave
    the q=±1 taps a zero-width base slice)."""
    for wt in range(target, 2 * factor - 1, -factor):
        if w % wt == 0 and wt % factor == 0:
            return wt
    return None


@functools.partial(
    jax.jit,
    static_argnames=("factor", "wt", "batch_tile", "interpret", "rt_target"),
)
def degrade_scene_tiles(
    x: jax.Array,
    comp: jax.Array,
    factor: int = 8,
    wt: int = 64,
    batch_tile: int | None = None,
    interpret: bool = False,
    rt_target: int = 64,
) -> jax.Array:
    """Degrade a whole scene via the tiles-in-lanes layout.

    x: [C, H, W]; comp: [C, K, K] COMPOSED kernel (blur (*) box, see
    `ops.degrade.compose_with_box`) with span K <= 3*factor. Returns
    [C, H/f, W/f], numerically identical to replicate-pad +
    `depthwise_conv2d(..., stride=factor)` — tile seams are exact (true
    neighbor columns baked into the layout).
    """
    c, h, w = x.shape
    ksize = comp.shape[-1]
    if ksize > 3 * factor:
        raise ValueError(
            f"tiles path supports kernel span <= 3*factor, got "
            f"{ksize} > {3 * factor}"
        )
    t, out_h, out_wt = w // wt, h // factor, wt // factor
    rt = _pick_rt(out_h, rt_target)
    if batch_tile is None:
        batch_tile = LANE if t % LANE == 0 else t
    if (h % factor or w % wt or wt % factor or wt < 2 * factor
            or rt is None or t % batch_tile):
        raise ValueError(
            f"no legal tiling: {(h, w, wt, factor, rt, batch_tile)}"
        )
    ext = scene_to_tiles_ext(x, factor, wt)
    prev, nxt = _prev_next_rows(ext, factor, rt)
    out = _tiles_pallas(
        ext, prev, nxt, comp, factor, wt, rt, batch_tile, interpret
    )
    # [C, out_h, out_wt, T] -> [C, out_h, W/f]: last-two swap (copy speed)
    return jnp.swapaxes(out, 2, 3).reshape(c, out_h, w // factor)


def _tiles_pallas(
    ext: jax.Array,
    prev: jax.Array,
    nxt: jax.Array,
    comp: jax.Array,
    factor: int,
    wt: int,
    rt: int,
    batch_tile: int,
    interpret: bool,
) -> jax.Array:
    """The Mosaic pass shared by `degrade_scene_tiles` (replicate row
    halos) and `degrade_rows_tiles` (real neighbor row halos). Returns
    the tiled output [C, out_h, Wt/f, T]."""
    c, _, out_h, we, t = ext.shape
    ksize = comp.shape[-1]
    out_wt = wt // factor
    grid = (c, out_h // rt, t // batch_tile)
    return pl.pallas_call(
        functools.partial(
            _degrade_kernel_tiles,
            factor=factor, ksize=ksize, wt=wt, out_wt=out_wt, rt=rt,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, factor, rt, we, batch_tile),
                lambda ci, ti, bi: (ci, 0, ti, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, factor, 1, we, batch_tile),
                lambda ci, ti, bi: (ci, 0, ti, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, factor, 1, we, batch_tile),
                lambda ci, ti, bi: (ci, 0, ti, 0, bi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c * ksize * ksize),
                lambda ci, ti, bi: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rt, out_wt, batch_tile),
            lambda ci, ti, bi: (ci, ti, 0, bi),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c, out_h, out_wt, t), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * c * out_h * out_wt * t * ksize * ksize,
            bytes_accessed=ext.size * 4 + c * out_h * out_wt * t * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ext, prev, nxt, comp.reshape(1, c * ksize * ksize).astype(jnp.float32))


@functools.partial(
    jax.jit,
    static_argnames=("factor", "wt", "batch_tile", "interpret", "rt_target"),
)
def degrade_rows_tiles(
    x: jax.Array,
    comp: jax.Array,
    factor: int,
    top_rows: jax.Array,
    bot_rows: jax.Array,
    wt: int = 64,
    batch_tile: int | None = None,
    interpret: bool = False,
    rt_target: int = 64,
) -> jax.Array:
    """`degrade_rows_fast`-contract variant of the tiles path: degrade a
    RAW row slab given thin real halos (sharded neighbors via ppermute,
    or edge-replicated rows at the global edges).

    x: [C, Hs, W]; top_rows/bot_rows: [C, >=half, W] / [C, >=K-half-f, W]
    of neighbor or edge content (same contract as
    `degrade_scene_fast.halo_rows`). Returns [C, Hs/f, W/f].

    The halo rows only enter the first `prev` / last `next` entry of the
    thin row-halo arrays — everything else is `degrade_scene_tiles`.
    """
    c, h, w = x.shape
    ksize = comp.shape[-1]
    half = (ksize - factor) // 2
    bh = ksize - half - factor
    if ksize > 3 * factor:
        raise ValueError(
            f"tiles path supports kernel span <= 3*factor, got "
            f"{ksize} > {3 * factor}"
        )
    if top_rows.shape[1] < half or bot_rows.shape[1] < max(bh, 0):
        raise ValueError(
            f"halos too thin: need ({half}, {bh}), "
            f"got ({top_rows.shape[1]}, {bot_rows.shape[1]})"
        )
    t, out_h = w // wt, h // factor
    rt = _pick_rt(out_h, rt_target)
    if batch_tile is None:
        batch_tile = LANE if t % LANE == 0 else t
    if (h % factor or w % wt or wt % factor or wt < 2 * factor
            or rt is None or t % batch_tile):
        raise ValueError(
            f"no legal tiling: {(h, w, wt, factor, rt, batch_tile)}"
        )
    ext = scene_to_tiles_ext(x, factor, wt)
    prev, nxt = _prev_next_rows(ext, factor, rt)
    if half > 0:
        # prev[., p, 0] must hold permuted image row p - f (read only for
        # p >= f - half): top_rows' last `half` rows are image rows
        # -half..-1, so row p - f sits at index (top - f + p); the clamp
        # fills unread p.
        top = top_rows.shape[1]
        rte_top = rows_to_tiles_ext(top_rows, factor, wt)  # [C, top, we, T]
        p_idx = jnp.clip(jnp.arange(factor) + top - factor, 0, top - 1)
        prev0 = jnp.take(rte_top, p_idx, axis=1)[:, :, None]
        prev = jnp.concatenate([prev0, prev[:, :, 1:]], axis=2)
    if bh > 0:
        # next[., p, -1] must hold permuted image row Hs + p (read only
        # for p < K - half - f): bot_rows starts at image row Hs.
        bot = bot_rows.shape[1]
        rte_bot = rows_to_tiles_ext(bot_rows, factor, wt)
        n_idx = jnp.clip(jnp.arange(factor), 0, bot - 1)
        nxt_last = jnp.take(rte_bot, n_idx, axis=1)[:, :, None]
        nxt = jnp.concatenate([nxt[:, :, :-1], nxt_last], axis=2)
    out = _tiles_pallas(
        ext, prev, nxt, comp, factor, wt, rt, batch_tile, interpret
    )
    return jnp.swapaxes(out, 2, 3).reshape(c, out_h, w // factor)
