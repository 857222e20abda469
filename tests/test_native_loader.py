"""Native threaded patch loader: build, gather, prefetch, error paths."""
import numpy as np
import pytest

pytest.importorskip("ctypes")

from kmsr_tpu.runtime import NativeLoaderUnavailable, NativePatchLoader


@pytest.fixture(scope="module")
def npy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    rng = np.random.default_rng(0)
    arrays = []
    for i in range(10):
        a = rng.normal(size=(5, 16, 16)).astype(np.float32)
        np.save(d / f"p{i:02d}.npy", a)
        arrays.append(a)
    return d, arrays


def make_loader(npy_dir):
    d, _ = npy_dir
    paths = sorted(str(p) for p in d.glob("*.npy"))
    try:
        return NativePatchLoader(paths, shape=(5, 16, 16), n_threads=4)
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")


def test_gather_matches_numpy(npy_dir):
    loader = make_loader(npy_dir)
    _, arrays = npy_dir
    idx = np.array([3, 0, 7, 3], np.int64)
    batch = loader.gather(idx)
    assert batch.shape == (4, 5, 16, 16)
    for row, i in zip(batch, idx):
        np.testing.assert_array_equal(row, arrays[i])
    loader.close()


def test_prefetch_double_buffer(npy_dir):
    loader = make_loader(npy_dir)
    _, arrays = npy_dir
    first = loader.gather(np.array([0, 1], np.int64))
    loader.prefetch(np.array([2, 3], np.int64))
    # ... device step would run here ...
    second = loader.wait()
    np.testing.assert_array_equal(first[0], arrays[0])
    np.testing.assert_array_equal(second[1], arrays[3])
    with pytest.raises(RuntimeError):
        loader.wait()  # nothing in flight
    loader.close()


def test_gather_bad_index(npy_dir):
    loader = make_loader(npy_dir)
    with pytest.raises(IOError):
        loader.gather(np.array([99], np.int64))
    loader.close()


def test_create_rejects_wrong_dtype(tmp_path):
    np.save(tmp_path / "bad.npy", np.zeros((5, 16, 16), np.float64))
    with pytest.raises((NativeLoaderUnavailable, IOError)):
        NativePatchLoader([str(tmp_path / "bad.npy")], shape=(5, 16, 16))


def test_gather_split_layout(npy_dir):
    """Split gather emits the pre-split degrade layout [C, f, H/f+2, W, B]:
    column phases contiguous, replicate halo rows baked, batch minor —
    exactly `ops.degrade_pallas.phase_split_chwb` of the natural gather."""
    loader = make_loader(npy_dir)
    _, arrays = npy_dir
    idx = np.array([4, 1, 8], np.int64)
    f = 4
    sp = loader.gather_split(idx, factor=f)
    c, h, w = 5, 16, 16
    assert sp.shape == (c, f, h // f + 2, w, len(idx))
    x = np.stack([arrays[i] for i in idx], axis=-1)  # [C, H, W, B]
    out_h, out_w = h // f, w // f
    xr = x.reshape(c, out_h, f, out_w, f, len(idx))
    xp = np.transpose(xr, (0, 2, 1, 4, 3, 5)).reshape(c, f, out_h, w, len(idx))
    np.testing.assert_array_equal(sp[:, :, 1:-1], xp)
    for p in range(f):  # halos: image row 0 / h-1 in every phase
        np.testing.assert_array_equal(sp[:, p, 0], xp[:, 0, 0])
        np.testing.assert_array_equal(sp[:, p, -1], xp[:, f - 1, out_h - 1])
    # prefetch variant returns the same buffer
    loader.prefetch_split(idx, factor=f)
    np.testing.assert_array_equal(loader.wait(), sp)
    loader.close()


def test_gather_split_halo_free(npy_dir):
    """halo=False drops the baked replicate rows: [C, f, H/f, W, B] ==
    the interior of the baked layout, byte count equal to the natural
    batch (the production `factory --input-format npy` layout)."""
    loader = make_loader(npy_dir)
    idx = np.array([4, 1, 8], np.int64)
    f = 4
    baked = loader.gather_split(idx, factor=f)
    free = loader.gather_split(idx, factor=f, halo=False)
    assert free.shape == (5, f, 16 // f, 16, len(idx))
    np.testing.assert_array_equal(free, baked[:, :, 1:-1])
    loader.prefetch_split(idx, factor=f, halo=False)
    np.testing.assert_array_equal(loader.wait(), free)
    loader.prefetch_split_dual(idx, factor=f, halo=False)
    split, nat = loader.wait()
    np.testing.assert_array_equal(split, free)
    np.testing.assert_array_equal(nat, loader.gather(idx))
    loader.close()


def test_gather_split_rejects_bad_factor(npy_dir):
    loader = make_loader(npy_dir)
    with pytest.raises(ValueError):
        loader.gather_split(np.array([0], np.int64), factor=5)  # 16 % 5
    loader.close()


def test_gather_split_dual(npy_dir):
    """The dual gather fills both layouts from ONE file read: the split
    buffer matches gather_split and the natural buffer matches gather."""
    loader = make_loader(npy_dir)
    idx = np.array([2, 7, 0], np.int64)
    loader.prefetch_split_dual(idx, factor=4)
    split, nat = loader.wait()
    np.testing.assert_array_equal(split, loader.gather_split(idx, factor=4))
    np.testing.assert_array_equal(nat, loader.gather(idx))
    loader.close()
