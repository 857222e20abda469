"""Landsat calibration: MTL parse, UTM transform, synthetic-scene ingest."""
import numpy as np
import pytest

from kmsr_tpu.io.landsat import (
    calc_landsat_toa,
    parse_mtl,
    utm_epsg_to_zone,
    utm_to_wgs84,
    wgs84_to_utm,
)

MTL = """GROUP = LANDSAT_METADATA_FILE
  LANDSAT_PRODUCT_ID = "LC08_L1TP_116035_20240101_20240101_02_T1"
  SUN_ELEVATION = 35.5
  RADIANCE_MULT_BAND_1 = 0.012
  RADIANCE_ADD_BAND_1 = -60.0
  RADIANCE_MULT_BAND_5 = 0.006
  RADIANCE_ADD_BAND_5 = -30.0
  REFLECTANCE_MULT_BAND_1 = 2.0E-05
  REFLECTANCE_ADD_BAND_1 = -0.1
END_GROUP = LANDSAT_METADATA_FILE
"""


def write_geotiff(path, data, origin=(300000.0, 4000000.0), pixel=30.0, epsg=32652,
                  transform=None):
    """Minimal GeoTIFF writer via PIL tags (scale + tiepoint + geokeys).

    With `transform` (a,b,c,d,e,f GDAL-style), writes a full
    ModelTransformation matrix (rotated/sheared rasters) instead of the
    scale+tiepoint pair (north-up only).
    """
    from PIL import Image, TiffImagePlugin

    img = Image.fromarray(data)
    info = TiffImagePlugin.ImageFileDirectory_v2()
    if transform is not None:
        a, b, c, d, e, f = transform
        info[34264] = (a, b, 0.0, c, d, e, 0.0, f,
                       0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    else:
        info[33550] = (pixel, pixel, 0.0)
        info[33922] = (0.0, 0.0, 0.0, origin[0], origin[1], 0.0)
    # GeoKeyDirectory: version 1.1.0, 1 key: ProjectedCSTypeGeoKey=epsg
    info[34735] = (1, 1, 0, 1, 3072, 0, 1, epsg)
    img.save(path, tiffinfo=info)


@pytest.fixture
def landsat_scene(tmp_path, rng):
    scene = tmp_path / "LC08_L1TP_test"
    scene.mkdir()
    (scene / "LC08_test_MTL.txt").write_text(MTL)
    dn1 = rng.integers(1, 65535, size=(24, 32)).astype(np.uint16)
    dn1[0, 0] = 0  # nodata pixel
    dn5 = rng.integers(1, 65535, size=(24, 32)).astype(np.uint16)
    write_geotiff(scene / "LC08_test_B1.TIF", dn1)
    write_geotiff(scene / "LC08_test_B5.TIF", dn5)
    return scene, dn1, dn5


def test_parse_mtl(tmp_path):
    p = tmp_path / "x_MTL.txt"
    p.write_text(MTL)
    kv = parse_mtl(str(p))
    assert kv["SUN_ELEVATION"] == "35.5"
    assert kv["LANDSAT_PRODUCT_ID"].startswith("LC08")


def test_utm_roundtrip():
    lon = np.array([129.0, 128.5, 130.2])
    lat = np.array([35.0, 34.2, 36.8])
    x, y = wgs84_to_utm(lon, lat, zone=52, northern=True)
    lon2, lat2 = utm_to_wgs84(x, y, zone=52, northern=True)
    np.testing.assert_allclose(lon2, lon, atol=1e-7)
    np.testing.assert_allclose(lat2, lat, atol=1e-7)


def test_utm_known_point():
    # central meridian of zone 52 is 129E; at equator easting=500000
    lon, lat = utm_to_wgs84(np.array([500000.0]), np.array([0.0]), 52, True)
    assert lon[0] == pytest.approx(129.0, abs=1e-9)
    assert lat[0] == pytest.approx(0.0, abs=1e-9)


def test_epsg_zone():
    assert utm_epsg_to_zone(32652) == (52, True)
    assert utm_epsg_to_zone(32752) == (52, False)
    with pytest.raises(ValueError):
        utm_epsg_to_zone(4326)


def test_calc_landsat_toa_radiance(landsat_scene, tmp_path):
    from kmsr_tpu.io import NCFile, read_band_stack

    scene, dn1, dn5 = landsat_scene
    out = calc_landsat_toa(str(scene), [1, 5], mode="rad", out_dir=str(tmp_path / "nc"))
    b = read_band_stack(out, "geophysical_data", band_names=["L_TOA_443", "L_TOA_865"])
    want1 = 0.012 * dn1.astype(np.float32) - 60.0
    np.testing.assert_allclose(b[0][1:], want1[1:], rtol=1e-5)
    assert np.isnan(b[0][0, 0])  # DN==0 -> fill -> NaN on read
    want5 = 0.006 * dn5.astype(np.float32) - 30.0
    np.testing.assert_allclose(b[1], want5, rtol=1e-5)

    nav = read_band_stack(out, "navigation_data", band_names=["latitude", "longitude"], fill_to_nan=False)
    lat, lon = nav[0], nav[1]
    assert lat.shape == (24, 32)
    # origin (300000, 4000000) zone 52N ~ (126.8E, 36.1N); sanity band
    assert 125 < lon.mean() < 129 and 35 < lat.mean() < 37
    # monotonic: lon increases with column, lat decreases with row
    assert (np.diff(lon.mean(axis=0)) > 0).all()
    assert (np.diff(lat.mean(axis=1)) < 0).all()
    with NCFile(out, "r") as f:
        attrs = f.get_attrs()
        assert attrs["source_epsg"] == 32652


def test_calc_landsat_toa_reflectance(landsat_scene, tmp_path):
    from kmsr_tpu.io import read_band_stack

    scene, dn1, _ = landsat_scene
    out = calc_landsat_toa(str(scene), [1], mode="ref", out_dir=str(tmp_path / "nc2"))
    b = read_band_stack(out, "geophysical_data", band_names=["L_TOA_443"])
    sin_el = np.sin(np.radians(35.5))
    want = (2.0e-05 * dn1.astype(np.float32) - 0.1) / sin_el
    np.testing.assert_allclose(b[0][1:], want[1:], rtol=1e-5)


def _make_scene(tmp_path, rng, name, transform=None, size=16):
    scene = tmp_path / name
    scene.mkdir()
    (scene / f"{name}_MTL.txt").write_text(MTL)
    dn = rng.integers(1, 65535, size=(size, size)).astype(np.uint16)
    write_geotiff(scene / f"{name}_B1.TIF", dn, transform=transform)
    return scene, dn


def test_calc_landsat_toa_rotated_90(tmp_path, rng):
    """A raster whose affine is the north-up affine composed with a pure
    90° rotation about the pixel-center grid's centroid covers the SAME
    physical points, permuted — so the rotated path's lat/lon grids must
    equal a permutation of the north-up path's (VERDICT r3 item 2;
    reference general branch A_00Landsat_cal_rad.py:134-143)."""
    from kmsr_tpu.io import read_band_stack

    n = 16
    c0, f0, px = 300000.0, 4000000.0, 30.0
    scene_nu, _ = _make_scene(tmp_path, rng, "LC08_nu", size=n)
    # pixel-center grid centroid
    pxc = c0 + px * n / 2
    pyc = f0 - px * n / 2
    # T'(col,row) = R_ccw90(T(col,row) - P) + P with R(dx,dy) = (-dy, dx):
    # x' = Px + Py - f0 + px*row ; y' = Py - Px + c0 + px*col
    rot = (0.0, px, pxc + pyc - f0, px, 0.0, pyc - pxc + c0)
    scene_rot, _ = _make_scene(tmp_path, rng, "LC08_rot", transform=rot, size=n)

    out_nu = calc_landsat_toa(str(scene_nu), [1], out_dir=str(tmp_path / "a"))
    out_rot = calc_landsat_toa(str(scene_rot), [1], out_dir=str(tmp_path / "b"))
    nav_nu = read_band_stack(out_nu, "navigation_data",
                             band_names=["latitude", "longitude"],
                             fill_to_nan=False)
    nav_rot = read_band_stack(out_rot, "navigation_data",
                              band_names=["latitude", "longitude"],
                              fill_to_nan=False)
    # rotated pixel (row, col) lands on north-up pixel (n-1-col, row)
    for band in range(2):
        want = nav_nu[band][n - 1 - np.arange(n)[None, :],
                            np.arange(n)[:, None]]
        np.testing.assert_allclose(nav_rot[band], want, atol=1e-5)


def test_calc_landsat_toa_rotated_affine_centers(tmp_path, rng):
    """Arbitrary-angle rotated raster: the written lat/lon must match
    utm_to_wgs84 of independently computed affine pixel centers
    (x = a·col + b·row + c, y = d·col + e·row + f at col+0.5, row+0.5)."""
    from kmsr_tpu.io import read_band_stack

    n = 12
    th = np.radians(30.0)
    a, b = 30.0 * np.cos(th), 30.0 * np.sin(th)
    d, e = 30.0 * np.sin(th), -30.0 * np.cos(th)
    c, f = 300000.0, 4000000.0
    scene, _ = _make_scene(tmp_path, rng, "LC08_r30",
                           transform=(a, b, c, d, e, f), size=n)
    out = calc_landsat_toa(str(scene), [1], out_dir=str(tmp_path / "c"))
    nav = read_band_stack(out, "navigation_data",
                          band_names=["latitude", "longitude"],
                          fill_to_nan=False)
    cols = np.arange(n) + 0.5
    rows = np.arange(n) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    lon, lat = utm_to_wgs84(c + cg * a + rg * b, f + cg * d + rg * e,
                            zone=52, northern=True)
    np.testing.assert_allclose(nav[0], lat, atol=1e-5)
    np.testing.assert_allclose(nav[1], lon, atol=1e-5)
    # the grid is genuinely rotated: lon varies along BOTH axes
    assert np.abs(np.diff(nav[1], axis=0)).max() > 1e-5
    assert np.abs(np.diff(nav[1], axis=1)).max() > 1e-5


def test_calibrate_cli(landsat_scene, tmp_path, capsys):
    from kmsr_tpu.pipeline.calibrate_landsat import main

    scene, _, _ = landsat_scene
    rc = main(["--root", str(scene.parent), "--out-dir", str(tmp_path / "o"),
               "--bands", "1", "5"])
    assert rc == 0
    assert list((tmp_path / "o").glob("*_native.nc"))
