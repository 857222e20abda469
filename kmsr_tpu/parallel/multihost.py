"""Multi-host input pipeline: per-host file shards + global batch assembly.

The reference is a single-process, single-device repo (SURVEY.md section
2.8); its input side re-opens files from one local directory. At pod
scale the TPU-native input pipeline splits the FILE LIST across hosts
(each host only reads its own shard from disk/GCS — file bytes never
cross DCN) and assembles per-host batches into one globally-sharded
`jax.Array`, so a pjit-ed train step sees a single logical batch whose
shards already live on each host's local devices. Collectives inserted
by XLA then ride ICI; DCN carries nothing but the usual runtime control
traffic.

Single-process behavior is the identity (host 0 of 1 owns every file),
so every pipeline stage and trainer can call these helpers
unconditionally.
"""
from __future__ import annotations

from typing import Optional, Sequence, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

T = TypeVar("T")


def host_shard(
    items: Sequence[T],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list[T]:
    """Deterministic strided shard of a (sorted) work list for this host.

    Strided (round-robin) rather than contiguous so a size-ordered or
    date-ordered directory listing load-balances across hosts. All hosts
    must pass the same `items` order — callers should sort paths (the
    `list_patch_files` loaders already do).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} outside process_count {pc}")
    return list(items[pi::pc])


def host_batch_size(global_batch_size: int, process_count: Optional[int] = None) -> int:
    """The per-host slice of a global batch; validates divisibility."""
    pc = jax.process_count() if process_count is None else process_count
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {pc} hosts"
        )
    return global_batch_size // pc


def global_batch(
    mesh: Mesh, local_batch: np.ndarray, axis: str = "data"
) -> jax.Array:
    """Assemble per-host arrays into one batch-sharded global jax.Array.

    `local_batch` is THIS host's rows (shape [B_local, ...]); the result
    is a global array of shape [B_local * n_hosts, ...] with the leading
    axis sharded over `axis` — directly consumable by the pjit-ed train
    steps. Under one process this is exactly `shard_batch`.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_batch))


def initialize_if_needed() -> bool:
    """Initialize jax.distributed from the standard cluster env vars if a
    multi-host launch is detected. Returns True if initialization ran.

    Safe to call unconditionally at CLI start: a single-process run (no
    coordinator env) is a no-op — the helpers above then degrade to
    single-host behavior.
    """
    import os

    if jax.process_count() > 1:  # already initialized by the launcher
        return False
    if not (
        os.environ.get("COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    ):
        return False
    jax.distributed.initialize()
    return True
