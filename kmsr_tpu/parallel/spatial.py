"""Spatially-sharded whole-scene degradation with halo exchange.

The reference handles large scenes only by pre-cutting patches
(`A_00_patch_cutter_universal.py`). The TPU-native extension here degrades
a FULL scene (e.g. 8000^2 px Landsat) sharded row-wise across the mesh's
'data' axis: each device holds a contiguous row slab, exchanges a
(kernel//2)-row halo with its neighbors over ICI via `lax.ppermute`, and
runs the fused blur+downsample locally — the image analog of context/
sequence parallelism (SURVEY.md section 5.7).

Global edges use replicate padding so the result is bit-compatible with
the single-device `ops.degrade` path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API; the experimental alias is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.degrade import block_mean, depthwise_conv2d, normalize_kernel


def _halo_exchange(x_local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """x_local: [C, Hs, W] -> [C, Hs + 2*halo, W] with neighbor rows.

    Boundary shards replicate their own edge rows (global replicate-pad
    semantics).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x_local[:, :halo]        # my first rows -> previous neighbor
    bottom_rows = x_local[:, -halo:]    # my last rows -> next neighbor

    down = [(i, (i + 1) % n) for i in range(n)]
    up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(bottom_rows, axis_name, down)
    from_below = jax.lax.ppermute(top_rows, axis_name, up)

    edge_top = jnp.repeat(x_local[:, :1], halo, axis=1)
    edge_bottom = jnp.repeat(x_local[:, -1:], halo, axis=1)
    top_pad = jnp.where(idx == 0, edge_top, from_above)
    bottom_pad = jnp.where(idx == n - 1, edge_bottom, from_below)
    return jnp.concatenate([top_pad, x_local, bottom_pad], axis=1)


def degrade_scene_sharded(
    scene: jax.Array,
    kernel: jax.Array,
    mesh: Mesh,
    factor: int = 8,
    axis_name: str = "data",
) -> jax.Array:
    """scene: [C, H, W] (H divisible by n_devices*factor) -> [C, H/f, W/f].

    Row-sharded over `axis_name`; the blur halo (kernel//2 rows) rides ICI.
    """
    c, h, w = scene.shape
    n = mesh.shape[axis_name]
    if h % (n * factor) != 0:
        raise ValueError(f"H={h} must divide n_devices*factor={n * factor}")
    kernel = normalize_kernel(
        jnp.broadcast_to(kernel[None], (c, *kernel.shape))
        if kernel.ndim == 2
        else kernel
    )
    kh, kw = kernel.shape[-2:]
    halo = kh // 2

    def local_fn(x_local, k):
        x_ext = _halo_exchange(x_local, halo, axis_name)      # [C, Hs+2h, W]
        x_ext = jnp.pad(
            x_ext, ((0, 0), (0, 0), (kw // 2, kw // 2)), mode="edge"
        )
        blurred = depthwise_conv2d(x_ext[None], k)[0]          # [C, Hs, W]
        return block_mean(blurred[None], factor)[0]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis_name, None), P(None, None, None)),
        out_specs=P(None, axis_name, None),
    )
    return fn(scene, kernel)
