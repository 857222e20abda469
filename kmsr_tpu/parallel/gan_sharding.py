"""Sharding rules for GAN training state over a (data, model) mesh.

DP: the batch axis is sharded over 'data' (XLA inserts the gradient
all-reduce over ICI). TP: channel dimensions of the generator chains /
discriminator convs (and their Adam moments, SN vectors, BN stats) are
sharded over 'model'; XLA partitions the convs channel-wise and inserts
the contraction collectives. The models are small (<1 M params) so TP is
about validating the multi-chip path, not memory pressure — 'data' is the
axis that matters for throughput.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, model_size: int, min_dim: int = 16) -> P:
    """Shard the last axis whose size is a multiple of the model-axis size
    (and big enough to be a channel dim); replicate everything else."""
    try:
        shape = leaf.shape
    except AttributeError:
        return P()
    spec = [None] * len(shape)
    for axis in range(len(shape) - 1, -1, -1):
        if shape[axis] >= min_dim and shape[axis] % model_size == 0:
            spec[axis] = "model"
            break
    return P(*spec)


def state_shardings(mesh: Mesh, state):
    """Tree of NamedShardings for a GANTrainState (params + opt moments +
    SN/BN state all follow the same channel-axis rule)."""
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, model_size)), state
    )


def shard_state(mesh: Mesh, state):
    return jax.device_put(state, state_shardings(mesh, state))
