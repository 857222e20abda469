"""Stage: super-resolve FULL scenes via exact halo tiling (extension).

The SR network (`models.sr`) runs on fixed patches; a whole LR scene
(e.g. a 2000^2 GOCI-2 slot -> 16000^2 at x8) can neither fit VMEM-friendly
shapes nor one HBM output buffer. This stage tiles the scene on a fixed
LR grid and reassembles tile centers on host — **equal to the untiled
forward** (up to compute-dtype reduction order), not approximately
blended. Exactness requires care at scene borders: the net is only
translation-equivariant in the scene INTERIOR — zero conv-padding and
bilinear tap-clamping make borders special (padding the input once is NOT
the same as the per-layer SAME padding: after the first conv the halo is
bias-coloured, not zero). So every tile's input slab is cut from the real
scene with its edges CLAMPED to scene edges:

- interior tiles get a full halo of real pixels on all sides (halo >= the
  receptive-field radius => the cropped center is border-free);
- tiles at a scene border keep the scene border as their own border, so
  per-layer zero-padding and bilinear clamping happen exactly where the
  untiled forward pads and clamps.

All slabs share ONE shape (min(tile + 2*halo, scene extent) per axis);
only the center-crop offset varies, applied on device via a vmapped
dynamic_slice so the host transfer is just the cropped centers. The tile
batch is optionally sharded over a device mesh's 'data' axis —
whole-scene serving is embarrassingly data-parallel over tiles.

Usage:
    python -m kmsr_tpu.pipeline.sr_scene --input SCENE.nc_or_DIR \
        --model sr_model.npz --output-dir OUT [--in-group lr] \
        [--tile 64] [--halo auto] [--chunk 32] [--data-parallel]
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.sampler import list_patch_files
from ..io.ncio import copy_file_with_groups, read_band_stack, write_band_stack
from ..io.schema import GROUP_LR
from ..models.sr import SRConfig, sr_forward
from .common import RunReport
from .sr_infer import load_sr_model


def receptive_halo(cfg: SRConfig) -> int:
    """Upper bound (in LR pixels) on the SR net's receptive-field radius:
    3x3 head + 2 convs per residual block + body_tail contribute 1 LR px
    each; the upsampler convs run at >= LR scale and sum to < 2 LR px."""
    return 2 * cfg.n_blocks + 4


def sr_scene(
    params: dict,
    scene: np.ndarray,
    cfg: SRConfig = SRConfig(),
    tile: int = 64,
    halo: int | None = None,
    chunk: int = 32,
    mesh=None,
    compute_dtype=jnp.bfloat16,
) -> np.ndarray:
    """[C, H, W] LR scene -> [C, H*factor, W*factor] SR scene (host array).

    NaN-aware: NaN pixels are band-mean-filled for the network and the
    output footprint of every NaN LR pixel is restored to NaN.
    """
    scene = np.asarray(scene, np.float32)
    c, h, w = scene.shape
    f = cfg.factor
    th, tw = min(tile, h), min(tile, w)
    r = receptive_halo(cfg) if halo is None else halo
    slab_h, slab_w = min(h, th + 2 * r), min(w, tw + 2 * r)

    valid = np.isfinite(scene)
    if not valid.all():
        fills = np.array(
            [np.nanmean(scene[i]) if valid[i].any() else 0.0 for i in range(c)],
            np.float32,
        )
        filled = np.where(valid, scene, fills[:, None, None]).astype(np.float32)
    else:
        filled = scene

    def anchors(n, t):
        a = list(range(0, n - t + 1, t))
        if a[-1] != n - t:
            a.append(n - t)  # shifted last tile, fully in-scene
        return a

    coords = [(y, x) for y in anchors(h, th) for x in anchors(w, tw)]

    def one(p, slab, oy, ox):
        out = sr_forward(p, slab[None], cfg, compute_dtype)[0]
        return jax.lax.dynamic_slice(
            out, (0, oy, ox), (c, th * f, tw * f)
        )

    fwd = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if chunk % n_dev:  # shards must be even; round up, don't fail mid-run
            chunk = -(-chunk // n_dev) * n_dev
        sharding = NamedSharding(mesh, P("data"))

    out = np.empty((c, h * f, w * f), np.float32)

    def assemble(group, res_dev):
        # np.asarray is the sync point: it blocks on chunk i's device
        # compute + D2H while chunk i+1 (already dispatched) executes.
        res = np.asarray(res_dev)[: len(group)]
        for (y0, x0), tile_out in zip(group, res):
            out[:, y0 * f : (y0 + th) * f, x0 * f : (x0 + tw) * f] = tile_out

    pending = None  # one-deep pipeline: (group, in-flight device result)
    for i0 in range(0, len(coords), chunk):
        group = coords[i0 : i0 + chunk]
        n = len(group)
        slabs, oys, oxs = [], [], []
        for y0, x0 in group:
            ystart = min(max(y0 - r, 0), h - slab_h)
            xstart = min(max(x0 - r, 0), w - slab_w)
            slabs.append(filled[:, ystart : ystart + slab_h, xstart : xstart + slab_w])
            oys.append((y0 - ystart) * f)
            oxs.append((x0 - xstart) * f)
        slabs = np.stack(slabs)
        if n < chunk:  # keep ONE compiled shape (and even mesh shards)
            padn = chunk - n
            slabs = np.concatenate(
                [slabs, np.zeros((padn, *slabs.shape[1:]), np.float32)]
            )
            oys += [0] * padn
            oxs += [0] * padn
        sb = jnp.asarray(slabs)
        if sharding is not None:
            sb = jax.device_put(sb, sharding)
        res_dev = fwd(
            params, sb, jnp.asarray(oys, jnp.int32), jnp.asarray(oxs, jnp.int32)
        )
        if pending is not None:
            assemble(*pending)
        pending = (group, res_dev)
    if pending is not None:
        assemble(*pending)

    if not valid.all():
        # in-place masked write on a block view — a repeated boolean mask
        # would allocate another full-HR array (GBs at scene scale)
        np.copyto(
            out.reshape(c, h, f, w, f),
            np.nan,
            where=~valid[:, :, None, :, None],
        )
    return out


def sr_scene_folder(
    input_path: str,
    model_path: str,
    output_dir: str,
    cfg: SRConfig = SRConfig(),
    in_group: str = GROUP_LR,
    out_group: str = "sr",
    tile: int = 64,
    halo: int | None = None,
    chunk: int = 32,
    mesh=None,
) -> RunReport:
    t0 = time.time()
    params = load_sr_model(model_path, cfg)
    files = (
        [input_path] if os.path.isfile(input_path)
        else list_patch_files(input_path, "*.nc")
    )
    os.makedirs(output_dir, exist_ok=True)
    ok, fail = [], []
    total_px = 0
    for path in files:
        try:
            scene = read_band_stack(path, in_group)
            sr = sr_scene(params, scene, cfg, tile=tile, halo=halo,
                          chunk=chunk, mesh=mesh)
            dst = os.path.join(output_dir, os.path.basename(path))
            copy_file_with_groups(path, dst)
            write_band_stack(
                dst, out_group, sr, mode="a",
                group_attrs={
                    "source_group": in_group, "factor": cfg.factor,
                    "tile": tile, "halo": halo if halo is not None
                    else receptive_halo(cfg),
                    "model": os.path.basename(model_path),
                },
            )
            total_px += sr.shape[1] * sr.shape[2]
            ok.append(path)
        except Exception as e:  # per-file failure isolation
            fail.append((path, f"{type(e).__name__}: {e}"))
    dt = time.time() - t0
    print(
        f"sr_scene: {len(ok)} scene(s), {total_px / 1e6:.1f} Mpix out in "
        f"{dt:.1f}s ({total_px / dt / 1e6:.1f} Mpix/s end-to-end)"
    )
    return RunReport(succeeded=ok, failed=fail, seconds=dt)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Whole-scene SR via exact halo tiling")
    p.add_argument("--input", required=True, help="scene .nc or a dir of them")
    p.add_argument("--model", required=True, help="sr_model.npz")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--in-group", default=GROUP_LR)
    p.add_argument("--out-group", default="sr")
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--n-blocks", type=int, default=8)
    p.add_argument("--upsampler", default="progressive",
                   choices=["progressive", "oneshot"])
    p.add_argument("--tile", type=int, default=64)
    p.add_argument("--halo", type=int, default=None,
                   help="LR halo (default: the receptive-field bound)")
    p.add_argument("--chunk", type=int, default=32, help="tiles per dispatch")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the tile batch over all devices")
    return p


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    a = build_parser().parse_args(argv)
    cfg = SRConfig(width=a.width, n_blocks=a.n_blocks, factor=a.factor,
                   upsampler=a.upsampler)
    mesh = None
    if a.data_parallel:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(axis_names=("data",))
    rep = sr_scene_folder(
        a.input, a.model, a.output_dir, cfg, in_group=a.in_group,
        out_group=a.out_group, tile=a.tile, halo=a.halo, chunk=a.chunk,
        mesh=mesh,
    )
    for path, err in rep.failed:
        print(f"FAILED {path}: {err}")
    return 0 if not rep.failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
