"""Device-mesh and sharding helpers.

The reference is single-device (`single_kernel/train.py:124`); the TPU
build's parallelism is SPMD over an ICI mesh: data-parallel batches with
gradient psum inserted by XLA (via sharded jit), plus an optional 'model'
axis used to shard discriminator/generator channel dimensions (tensor
parallelism) and a spatial axis for whole-scene halo degrade
(`parallel/spatial.py`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: a 1-D 'data' mesh over all devices. Pass e.g.
    axis_sizes=(4, 2), axis_names=("data", "model") for a 2-D mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    n = int(np.prod(axis_sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis over `axis`, replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host array with the batch axis sharded over the mesh.

    Under a multi-host launch, `batch` is this host's rows (sampled from
    its own file shard, see `parallel.multihost`) and the result is the
    assembled GLOBAL array of shape [B_local * n_hosts, ...] — the train
    steps consume it unchanged.
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, axis), np.asarray(batch)
        )
    return jax.device_put(batch, batch_sharding(mesh, axis))
