"""Multi-host input-pipeline helpers (single-process semantics + shard
logic for simulated process counts)."""
import jax
import numpy as np
import pytest

from kmsr_tpu.parallel import (
    global_batch,
    host_batch_size,
    host_shard,
    initialize_if_needed,
    make_mesh,
)


def test_host_shard_partitions_exactly():
    files = [f"f{i:03d}.nc" for i in range(23)]
    shards = [host_shard(files, pi, 4) for pi in range(4)]
    # disjoint, complete, strided (load-balanced for sorted listings)
    assert sorted(sum(shards, [])) == files
    assert shards[0][:2] == ["f000.nc", "f004.nc"]
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_host_shard_single_process_identity():
    files = ["a", "b", "c"]
    assert host_shard(files) == files  # process 0 of 1


def test_host_shard_validates_index():
    with pytest.raises(ValueError):
        host_shard(["a"], process_index=3, process_count=2)


def test_host_batch_size():
    assert host_batch_size(32, 4) == 8
    assert host_batch_size(32) == 32  # single process
    with pytest.raises(ValueError):
        host_batch_size(33, 4)


def test_global_batch_single_process_is_batch_sharded():
    mesh = make_mesh(axis_names=("data",))
    local = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = global_batch(mesh, local)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), local)
    # leading axis actually sharded over the 8 virtual devices
    assert len(arr.sharding.device_set) == len(jax.devices())


def test_list_patch_files_host_shard_identity(tmp_path):
    """Under one process the auto host shard is the identity."""
    from kmsr_tpu.data.sampler import list_patch_files

    for i in range(3):
        (tmp_path / f"p{i}.nc").write_bytes(b"x")
    assert len(list_patch_files(str(tmp_path))) == 3


def test_initialize_if_needed_noop():
    assert initialize_if_needed() is False  # no coordinator env set
