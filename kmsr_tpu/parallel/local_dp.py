"""Per-host batch data-parallelism helpers for file-batched stages.

The multihost input layer shards FILES across hosts; within one host
these helpers shard a numpy batch over the local devices (GSPMD, no
communication) — the mesh must never span hosts.
"""
from __future__ import annotations


def local_batch_dp():
    """(sharding, n_dev) for per-host batch DP over `jax.local_devices()`;
    (None, 1) on single-device hosts. Per-host stages only: the multihost
    input layer already shards FILES across hosts, so this mesh must
    never span hosts (a host-local numpy batch cannot be placed on a
    global mesh)."""
    import jax

    devs = jax.local_devices()
    if len(devs) <= 1:
        return None, 1
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    return (
        NamedSharding(Mesh(np.array(devs), ("data",)), P("data")),
        len(devs),
    )


def pad_put(host, sharding, n_dev: int):
    """Pad axis 0 to an n_dev multiple and place with `sharding` (plain
    device transfer when sharding is None); returns (batch, original_b).
    Callers slice device outputs back to original_b."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    b = host.shape[0]
    if sharding is None:
        return jnp.asarray(host), b
    b_pad = -(-b // n_dev) * n_dev
    if b_pad != b:
        host = np.pad(host, [(0, b_pad - b)] + [(0, 0)] * (host.ndim - 1))
    return jax.device_put(host, sharding), b
