"""Synthetic Landsat C2 L1 scene dirs (GeoTIFF + MTL) for ingest tests.

Mirrors the on-disk layout `A_00Landsat_cal_rad.py` consumes: a scene
directory holding `*_MTL.txt` plus one `*_B{n}.TIF` GeoTIFF per band,
written with PIL using the GeoTIFF scale/tiepoint/geokey tags the
rasterio-free reader (`kmsr_tpu.io.landsat.read_geotiff`) understands.
"""
from __future__ import annotations

import numpy as np

#: Full 5-band MTL with radiance + reflectance coefficients. Band 5 (NIR,
#: 865 nm) is scaled so its radiance lands inside the water-mask window
#: [1e-6, 7.0] for any DN — keeping synthetic patches mask-clean.
MTL_5BAND = """GROUP = LANDSAT_METADATA_FILE
  LANDSAT_PRODUCT_ID = "LC08_L1TP_116035_20240101_20240101_02_T1"
  SUN_ELEVATION = 35.5
  RADIANCE_MULT_BAND_1 = 0.012
  RADIANCE_ADD_BAND_1 = -60.0
  RADIANCE_MULT_BAND_2 = 0.011
  RADIANCE_ADD_BAND_2 = -55.0
  RADIANCE_MULT_BAND_3 = 0.010
  RADIANCE_ADD_BAND_3 = -50.0
  RADIANCE_MULT_BAND_4 = 0.009
  RADIANCE_ADD_BAND_4 = -45.0
  RADIANCE_MULT_BAND_5 = 1.0E-05
  RADIANCE_ADD_BAND_5 = 0.5
  REFLECTANCE_MULT_BAND_1 = 2.0E-05
  REFLECTANCE_ADD_BAND_1 = -0.1
  REFLECTANCE_MULT_BAND_2 = 2.0E-05
  REFLECTANCE_ADD_BAND_2 = -0.1
  REFLECTANCE_MULT_BAND_3 = 2.0E-05
  REFLECTANCE_ADD_BAND_3 = -0.1
  REFLECTANCE_MULT_BAND_4 = 2.0E-05
  REFLECTANCE_ADD_BAND_4 = -0.1
  REFLECTANCE_MULT_BAND_5 = 2.0E-05
  REFLECTANCE_ADD_BAND_5 = -0.1
END_GROUP = LANDSAT_METADATA_FILE
"""


def write_geotiff(path, data, origin=(300000.0, 4000000.0), pixel=30.0, epsg=32652):
    """Minimal GeoTIFF writer via PIL tags (scale + tiepoint + geokeys)."""
    from PIL import Image, TiffImagePlugin

    img = Image.fromarray(data)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    info[33550] = (pixel, pixel, 0.0)
    info[33922] = (0.0, 0.0, 0.0, origin[0], origin[1], 0.0)
    # GeoKeyDirectory: version 1.1.0, 1 key: ProjectedCSTypeGeoKey=epsg
    info[34735] = (1, 1, 0, 1, 3072, 0, 1, epsg)
    img.save(path, tiffinfo=info)


def make_landsat_scene(scene_dir, rng, bands=(1, 2, 3, 4, 5), shape=(48, 64)):
    """Create a synthetic LC08 scene dir; returns {band: DN array}."""
    scene_dir.mkdir(parents=True, exist_ok=True)
    (scene_dir / "LC08_test_MTL.txt").write_text(MTL_5BAND)
    dns = {}
    for b in bands:
        dn = rng.integers(1, 65535, size=shape).astype(np.uint16)
        write_geotiff(scene_dir / f"LC08_test_B{b}.TIF", dn)
        dns[b] = dn
    return dns
