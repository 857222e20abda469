"""jax version compatibility shims shared across the package."""
from __future__ import annotations

try:  # jax >= 0.8 top-level API; the experimental alias is deprecated
    from jax import shard_map

    #: pallas_call outputs carry no varying-mesh-axes annotation, so every
    #: shard_map over a Pallas kernel must disable the check — under
    #: whichever keyword this jax spells it.
    VMA_KW = {"check_vma": False}
except ImportError:  # pragma: no cover - older jax spells it check_rep
    from jax.experimental.shard_map import shard_map

    VMA_KW = {"check_rep": False}

__all__ = ["shard_map", "VMA_KW"]
