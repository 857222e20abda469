"""Stage: degrade FULL scenes (no pre-cutting) across the device mesh.

Framework extension beyond the reference: the reference can only degrade
256^2 patches (`C_30apply_kernel_to_landsat.py`) because whole Landsat
scenes (~8000^2 px) never fit its per-patch workflow — scenes must be cut
first (`A_00_patch_cutter_universal.py`). Here a whole scene is degraded
in ONE device pass, row-sharded over the mesh's 'data' axis with the blur
halo exchanged over ICI (`parallel.spatial.degrade_scene`) — the image
analog of context parallelism (SURVEY.md section 5.7). NaN pixels are
mean-filled for the blur and the all-NaN downsampled cells restored, so
masked scenes survive the conv.

Usage:
    python -m kmsr_tpu.pipeline.degrade_scene --input SCENE.nc_or_DIR \
        --kernel kernel_per_band.npy --output-dir OUT [--factor 8] \
        [--in-group geophysical_data] [--out-group blurred]
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
from ..io.schema import GROUP_BLURRED, GROUP_GEO, RADIANCE_UNITS
from ..parallel.spatial import degrade_scene
from .apply_kernel import load_kernel
from .common import RunReport


def degrade_scene_file(
    scene: np.ndarray, kernel: jax.Array, factor: int, mesh=None,
    impl: str = "fast",
) -> np.ndarray:
    """[C, H, W] host scene -> [C, H//f, W//f]; NaN-aware (band-mean fill
    for the blur, cells whose whole footprint was NaN restored to NaN)."""
    c = scene.shape[0]
    valid = ~np.isnan(scene)
    if valid.all():
        return np.asarray(
            degrade_scene(jnp.asarray(scene), kernel, mesh, factor, impl=impl)
        )
    fills = np.array(
        [np.nanmean(scene[i]) if valid[i].any() else 0.0 for i in range(c)],
        np.float32,
    )
    filled = np.where(valid, scene, fills[:, None, None]).astype(np.float32)
    out = np.asarray(
        degrade_scene(jnp.asarray(filled), kernel, mesh, factor, impl=impl)
    )
    # a downsampled cell is NaN iff its factor x factor footprint had no
    # valid pixel at all (same convention as the cutter's NaN gate)
    h_keep = (scene.shape[1] // factor) * factor
    w_keep = (scene.shape[2] // factor) * factor
    v = valid[:, :h_keep, :w_keep].reshape(
        c, h_keep // factor, factor, w_keep // factor, factor
    )
    any_valid = v.any(axis=(2, 4))
    return np.where(any_valid, out, np.nan).astype(np.float32)


def process_scenes(
    input_path: str,
    kernel_path: str,
    output_dir: str,
    factor: int = 8,
    in_group: str = GROUP_GEO,
    out_group: str = GROUP_BLURRED,
    suffix: str = "_blurred",
    impl: str = "fast",
) -> RunReport:
    t0 = time.time()
    kernel = jnp.asarray(load_kernel(kernel_path))
    files = (
        [input_path]
        if os.path.isfile(input_path)
        else list_patch_files(input_path, "*.nc")
    )
    os.makedirs(output_dir, exist_ok=True)
    ok, fail = [], []
    for path in files:
        try:
            scene = read_band_stack(path, in_group)
            lr = degrade_scene_file(scene, kernel, factor, impl=impl)
            base = os.path.splitext(os.path.basename(path))[0]
            out_path = os.path.join(output_dir, f"{base}{suffix}.nc")
            copy_file_with_groups(path, out_path)
            write_band_stack(
                out_path,
                out_group,
                lr,
                dims=(f"y_{out_group}", f"x_{out_group}"),
                mode="a",
                var_attrs={"units": RADIANCE_UNITS},
                group_attrs={
                    "history": (
                        f"whole-scene blur + {factor}x downsample, "
                        f"row-sharded over {len(jax.devices())} device(s)"
                    ),
                    "kernel_file": os.path.basename(kernel_path),
                },
            )
            ok.append(out_path)
        except Exception as e:  # per-file failure isolation
            fail.append((path, str(e)))
    report = RunReport(succeeded=ok, failed=fail, seconds=time.time() - t0)
    print(f"degrade_scene: {report.summary()} -> {output_dir}")
    return report


def main(argv=None) -> int:
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser(description="Whole-scene sharded degrade")
    p.add_argument("--input", required=True, help=".nc scene file or folder")
    p.add_argument("--kernel", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--factor", type=int, default=8)
    p.add_argument("--in-group", default=GROUP_GEO)
    p.add_argument("--out-group", default=GROUP_BLURRED)
    p.add_argument("--suffix", default="_blurred")
    p.add_argument("--impl", choices=["fast", "bands"],
                   default="fast",
                   help="fast: raw-slab phase planes; bands: row-band conv")
    a = p.parse_args(argv)
    report = process_scenes(
        a.input, a.kernel, a.output_dir,
        factor=a.factor, in_group=a.in_group, out_group=a.out_group,
        suffix=a.suffix, impl=a.impl,
    )
    return 0 if report.n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
