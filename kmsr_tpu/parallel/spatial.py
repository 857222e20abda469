"""Spatially-sharded whole-scene degradation with halo exchange.

The reference handles large scenes only by pre-cutting patches
(`A_00_patch_cutter_universal.py`). The TPU-native extension here degrades
a FULL scene (e.g. 8000^2 px Landsat) sharded row-wise across the mesh's
'data' axis: each device holds a contiguous row slab, exchanges a halo
with its neighbors over ICI via `lax.ppermute`, and runs the fused
blur+downsample locally — the image analog of context/sequence
parallelism (SURVEY.md section 5.7).

Global edges use replicate padding so the result is bit-compatible with
the single-device `ops.degrade` path.

Two local implementations:
- 'fast' (default): the raw-rows column-phase Pallas stencil
  (`ops.degrade_scene_fast.degrade_rows_fast`). The halo is the
  mathematically-minimal `halo_rows` (~6 rows each way for f=8, 13x13
  composed), exchanged as two THIN arrays — no slab-sized halo concat
  is ever assembled; edge output rows/cols come from strip convs over
  the real halos, so the slab's column split is the only full HBM
  pre-pass.
- 'bands': the older row-band batched XLA conv (kept as fallback and
  cross-check; see `_degrade_slab` for its layout notes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .compat import VMA_KW as _VMA_KW, shard_map
from ..ops.degrade import compose_with_box, depthwise_conv2d, normalize_kernel
from ..ops.degrade_scene_fast import degrade_rows_fast, halo_rows


def _thin_halo(
    x_local: jax.Array, top: int, bot: int, axis_name: str
) -> tuple[jax.Array, jax.Array]:
    """(top_rows [C, top, W], bot_rows [C, bot, W]) of neighbor content
    for a row slab — WITHOUT assembling an extended slab (the raw-rows
    fast path consumes the halos separately, so the per-shard
    slab-sized concat of `_halo_exchange` never happens).

    Boundary shards replicate their own edge rows (global replicate-pad
    semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    # my last `top` rows -> next device's top halo; first `bot` -> previous
    from_above = jax.lax.ppermute(x_local[:, -top:], axis_name, down)
    from_below = jax.lax.ppermute(x_local[:, :bot], axis_name, up)

    edge_top = jnp.repeat(x_local[:, :1], top, axis=1)
    edge_bottom = jnp.repeat(x_local[:, -1:], bot, axis=1)
    top_rows = jnp.where(idx == 0, edge_top, from_above)
    bot_rows = jnp.where(idx == n - 1, edge_bottom, from_below)
    return top_rows, bot_rows


def _halo_exchange(
    x_local: jax.Array, top: int, bot: int, axis_name: str
) -> jax.Array:
    """x_local: [C, Hs, W] -> [C, top + Hs + bot, W] with neighbor rows
    (the 'bands' fallback path; costs one slab-sized concat)."""
    top_rows, bot_rows = _thin_halo(x_local, top, bot, axis_name)
    return jnp.concatenate([top_rows, x_local, bot_rows], axis=1)


def degrade_scene_sharded(
    scene: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    factor: int = 8,
    axis_name: str = "data",
    impl: str = "fast",
) -> jax.Array:
    """scene: [C, H, W] (H divisible by n_devices*factor, W by factor)
    -> [C, H/f, W/f]. Row-sharded over `axis_name`; the blur halo rides
    ICI. impl: 'fast' | 'bands' (see module docstring)."""
    c, h, w = scene.shape
    n = mesh.shape[axis_name]
    if h % (n * factor) != 0:
        raise ValueError(f"H={h} must divide n_devices*factor={n * factor}")
    if w % factor != 0:
        raise ValueError(f"W={w} must be a multiple of factor={factor}")
    kernel = normalize_kernel(
        jnp.broadcast_to(kernel[None], (c, *kernel.shape))
        if kernel.ndim == 2
        else kernel
    )
    kh, kw = kernel.shape[-2:]
    # Fused form: blur (*) box at stride `factor` — the full-resolution
    # blurred intermediate is never materialized (a 8192^2 scene would
    # otherwise cost an extra ~1.3 GB of HBM per band-stack plus layout
    # copies; measured OOM on one v5e chip unfused).
    comp = compose_with_box(kernel, factor)  # [C, kh+f-1, kw+f-1]
    ksize = comp.shape[-1]

    # (a "tiles"-in-lanes local path existed through round 2 and was
    # REMOVED in round 3: its kernel pass was fast (~5 ms/8192^2 scene,
    # every tap lane-aligned) but the on-device layout transform it
    # requires ran at 8x copy speed — 27 ms, more than the ENTIRE
    # raw-slab path — so it always lost end-to-end: 2.08 vs 2.56 Gpix/s.
    # See BASELINE.md for the measurements and the rejected rescues.)
    if impl == "tiles":  # removed alias, kept for config compat
        impl = "fast"
    if impl not in ("fast", "bands"):
        raise ValueError(f"impl must be fast|bands, got {impl!r}")
    if impl == "fast":
        top, bot = halo_rows(factor, ksize)
        # strip convs reach ksize-ish rows into the slab; thinner slabs
        # take the old path
        if h // n < 2 * ksize:
            impl = "bands"
    if impl == "fast":
        # Pick the local backend from the MESH devices, not
        # jax.default_backend(): in a mixed-platform process (real TPU
        # plugin + forced-host CPU devices, e.g. the driver's multichip
        # dry run) the default backend is the TPU even when this mesh is
        # CPU — the Mosaic path would then fail with "only interpret
        # mode is supported on CPU backend".
        local_impl = (
            "pallas"
            if next(iter(mesh.devices.flat)).platform == "tpu"
            else "xla"
        )

        def local_fn(x_local, k_comp):
            top_rows, bot_rows = _thin_halo(
                x_local, max(top, 1), max(bot, 1), axis_name
            )
            return degrade_rows_fast(
                x_local, k_comp, factor, top_rows, bot_rows,
                impl=local_impl,
            )
    else:  # bands
        halo = kh // 2

        def local_fn(x_local, k_comp):
            x_ext = _halo_exchange(x_local, halo, halo, axis_name)
            x_ext = jnp.pad(
                x_ext, ((0, 0), (0, 0), (kw // 2, kw // 2)), mode="edge"
            )
            return _degrade_slab(x_ext, k_comp, factor, ext=2 * halo)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, None, None)),
        out_specs=P(None, axis_name, None),
        # pallas_call outputs carry no varying-mesh-axes annotation; the
        # out_specs above already pin the row sharding
        **_VMA_KW,
    )
    return fn(scene, comp)


# Output rows per row band. XLA's strided depthwise conv degenerates on
# whole-scene spatial extents (a 25x im2col-style layout copy: measured
# OOM at 8192^2 on one 16 GB v5e chip, and ~290 Mpix/s at 4096^2). Slicing
# rows into overlapping bands stacked on the conv's BATCH dim — built from
# free reshape views + one concat, with "CNHW" dimension numbers so no
# transpose is ever materialized — reaches ~980 Mpix/s at 8192^2 on the
# same chip. Band size 8 won the measured sweep (4: 955, 8: 984, 16: 860,
# 32: 677 Mpix/s); bands also bound the conv's scratch to one band-row.
# Superseded by the phase-plane path (ops.degrade_scene_fast) but kept as
# the fallback for exotic kernel spans and as an independent cross-check.
_BAND_OUT_ROWS = 8


def _degrade_slab(
    xp: jax.Array, comp: jax.Array, factor: int, ext: int
) -> jax.Array:
    """Strided depthwise conv of a pre-padded slab via row-band batching.

    xp: [C, Hs + ext, W + ext] (already halo/edge padded); comp: the
    blur (*) box composed kernel [C, ext+factor, ext+factor], stride
    `factor`. Returns [C, Hs/factor, W/factor].
    """
    c = xp.shape[0]
    hs, w = xp.shape[1] - ext, xp.shape[2] - ext
    out_rows = hs // factor
    t = _BAND_OUT_ROWS
    while out_rows % t:  # largest divisor of the output rows <= default
        t -= 1
    s = t * factor
    nt = hs // s
    # s < ext: the next-band overlap slice [:, :, :ext] below can only
    # supply s rows, silently producing 0-height conv outputs (caught on
    # hardware by scripts/tpu_parity.py: prime out_rows forces t=1, so
    # s=factor < ext for any kernel wider than 2*factor+1). The unbanded
    # conv is the correct general fallback for such exotic shapes.
    if nt <= 1 or s < ext:
        return depthwise_conv2d(xp[None], comp, stride=factor)[0]
    need = (nt + 1) * s
    if xp.shape[1] < need:  # rows beyond nt*s+ext are reshaped past, not read
        xp = jnp.pad(xp, ((0, 0), (0, need - xp.shape[1]), (0, 0)))
    a = xp[:, : nt * s].reshape(c, nt, s, -1)  # free views;
    b = xp[:, s : (nt + 1) * s].reshape(c, nt, s, -1)[:, :, :ext]
    bands = jnp.concatenate([a, b], axis=2)  # [C, nt, s+ext, W+ext]: 1 copy
    out = jax.lax.conv_general_dilated(
        bands,
        comp[:, None],
        (factor, factor),
        "VALID",
        dimension_numbers=("CNHW", "OIHW", "CNHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )  # [C, nt, t, W/factor] — CNHW out: reshapes to the scene with no copy
    return out.reshape(c, nt * t, w // factor)


def degrade_scene(
    scene: jax.Array,
    kernel: jax.Array,
    mesh: Mesh | None = None,
    factor: int = 8,
    axis_name: str = "data",
    impl: str = "fast",
) -> jax.Array:
    """Shape-tolerant whole-scene degrade: [C, H, W] -> [C, H//f, W//f].

    Wraps `degrade_scene_sharded` for arbitrary scene sizes: H and W are
    cropped down to multiples of `factor` (the reference's stacked
    avg-pools floor odd dims the same way), then H is padded UP to a
    multiple of n_devices*factor with edge-replicated rows. Because the
    single-device path replicate-pads the blur at the true bottom edge,
    the padded rows are exactly the rows that padding would synthesize —
    kept output rows are bit-compatible with `ops.degrade`; the extra
    blocks are cropped off. `mesh=None` builds a 1-D mesh over all
    visible devices.
    """
    if mesh is None:
        import numpy as np

        mesh = Mesh(np.array(jax.devices()), (axis_name,))
    c, h, w = scene.shape
    h_keep, w_keep = (h // factor) * factor, (w // factor) * factor
    scene = scene[:, :h_keep, :w_keep]
    n = mesh.shape[axis_name]
    tile = n * factor
    pad_rows = (-h_keep) % tile
    if pad_rows:
        edge = jnp.repeat(scene[:, -1:], pad_rows, axis=1)
        scene = jnp.concatenate([scene, edge], axis=1)
    out = degrade_scene_sharded(scene, kernel, mesh, factor, axis_name, impl)
    return out[:, : h_keep // factor]
