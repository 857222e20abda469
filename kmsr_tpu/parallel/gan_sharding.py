"""Sharding rules for GAN training state over a (data, model) mesh.

DP: the batch axis is sharded over 'data' (XLA inserts the gradient
all-reduce over ICI). TP: channel dimensions of the generator chains /
discriminator convs (and their Adam moments, SN vectors, BN stats) are
sharded over 'model'; XLA partitions the convs channel-wise and inserts
the contraction collectives. The models are small (<1 M params) so TP is
about validating the multi-chip path, not memory pressure — 'data' is the
axis that matters for throughput.

The rules are explicit and per-leaf, keyed on the state-tree path (a
silent replicate fallback only applies to leaves no rule names):

- generator chain weights ``layers[i]`` `[band, out, in, kh, kw]` (and
  their Adam moments, whose paths contain the same keys): column-parallel
  on the OUT channel axis — each shard computes its output channels fully
  locally, so TP results match single-device bit-for-bit up to the XLA
  all-gather between layers; the last layer (out=1) falls back to the IN
  axis (row-parallel psum).
- discriminator ``convs[i]`` `w [O, I, k, k]` / `b [O]`: column-parallel
  on O.
- `[O]`-shaped side state (``bn_scale/bn_bias/bn_mean/bn_var`` and the
  spectral-norm ``u`` vectors): sharded on O alongside their convs.
- everything else (rng, step, optimizer counts): replicated.

`tests/test_train_single.py::test_tp_matches_single_device` asserts the
(data, model) mesh reproduces single-device numerics.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path_str: str, shape, m: int) -> P:
    def ok(ax: int) -> bool:
        return shape[ax] >= m and shape[ax] % m == 0

    if "layers" in path_str and len(shape) == 5:
        if ok(1):
            return P(None, "model")
        if ok(2):
            return P(None, None, "model")
        return P()
    if "convs" in path_str:
        if len(shape) in (1, 4) and ok(0):
            return P("model")
        return P()
    if any(t in path_str for t in ("bn_scale", "bn_bias", "bn_mean", "bn_var", "'u'")):
        if len(shape) == 1 and ok(0):
            return P("model")
        return P()
    return P()


def state_shardings(mesh: Mesh, state):
    """Tree of NamedShardings for a GANTrainState (params + opt moments +
    SN/BN state all follow the explicit per-leaf rules above)."""
    if "model" not in mesh.axis_names:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), state)
    m = mesh.shape["model"]

    def leaf_sharding(path, leaf):
        shape = getattr(leaf, "shape", None)
        if not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(jax.tree_util.keystr(path), shape, m))

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def shard_state(mesh: Mesh, state):
    return jax.device_put(state, state_shardings(mesh, state))
