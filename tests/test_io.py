import numpy as np
import pytest

from kmsr_tpu.io import (
    BAND_NAMES,
    INVALID_VALUE,
    NCFile,
    PatchProvenance,
    copy_file_with_groups,
    read_band_stack,
    write_band_stack,
)


def test_band_stack_roundtrip(tmp_path, rng):
    path = tmp_path / "patch.nc"
    stack = rng.normal(size=(5, 32, 32)).astype(np.float32)
    write_band_stack(path, "geophysical_data", stack, mode="w")
    out = read_band_stack(path, "geophysical_data")
    np.testing.assert_array_equal(out, stack)


def test_fill_value_to_nan(tmp_path, rng):
    path = tmp_path / "patch.nc"
    stack = rng.normal(size=(5, 16, 16)).astype(np.float32)
    stack[:, 0, 0] = INVALID_VALUE
    write_band_stack(path, "geophysical_data", stack, mode="w")
    out = read_band_stack(path, "geophysical_data")
    assert np.isnan(out[:, 0, 0]).all()
    assert np.isfinite(out[:, 1:, :]).all()


def test_multiple_groups_and_attrs(tmp_path, rng):
    path = tmp_path / "sample.nc"
    hr = rng.normal(size=(5, 64, 64)).astype(np.float32)
    lr = rng.normal(size=(5, 8, 8)).astype(np.float32)
    write_band_stack(path, "hr", hr, mode="w")
    write_band_stack(path, "lr", lr, mode="a", group_attrs={"h_factor": 1.8})
    with NCFile(path, "a") as f:
        f.set_attrs(
            PatchProvenance("src.nc", 1, 2, 128, 256, 64).as_attrs()
        )
    np.testing.assert_array_equal(read_band_stack(path, "hr"), hr)
    np.testing.assert_array_equal(read_band_stack(path, "lr"), lr)
    with NCFile(path, "r") as f:
        attrs = f.get_attrs()
        assert attrs["grid_i"] == 1 and attrs["w_offset"] == 256
        assert f.get_attrs(group="lr")["h_factor"] == pytest.approx(1.8)
        assert set(f.variable_names("hr")) == set(BAND_NAMES)


def test_copy_with_groups(tmp_path, rng):
    src = tmp_path / "a.nc"
    dst = tmp_path / "b.nc"
    geo = rng.normal(size=(5, 16, 16)).astype(np.float32)
    write_band_stack(src, "geophysical_data", geo, mode="w")
    with NCFile(src, "a") as f:
        f.set_attrs({"patch_size": 16})
    copy_file_with_groups(str(src), str(dst))
    np.testing.assert_array_equal(read_band_stack(dst, "geophysical_data"), geo)
    with NCFile(dst, "r") as f:
        assert f.get_attrs()["patch_size"] == 16


def test_netcdf_dimension_scale_conventions(tmp_path, rng):
    """Datasets must carry the netCDF dimension-scale markers."""
    import h5py

    path = tmp_path / "conv.nc"
    write_band_stack(path, "geophysical_data", np.ones((5, 8, 8), np.float32), mode="w")
    with h5py.File(path, "r") as f:
        grp = f["geophysical_data"]
        assert grp["y"].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert b"netCDF dimension" in grp["y"].attrs["NAME"]
        assert grp["L_TOA_443"].attrs["_FillValue"] == np.float32(INVALID_VALUE)
        assert "_NCProperties" in f.attrs
