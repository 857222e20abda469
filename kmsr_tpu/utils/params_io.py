"""Flat .npz save/load for parameter pytrees (framework model artifacts).

Arrays are stored both under stable enumerated keys (for reload against a
template pytree with identical structure) and human-readable path names
(for inspection), mirroring the role of the reference's torch state_dict
files (e.g. `moe_kernels/moe_model.pth`).
"""
from __future__ import annotations

import jax
import numpy as np


def save_params(path: str, params) -> None:
    leaves, _ = jax.tree_util.tree_flatten(params)
    named = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for i, ((kp, v), leaf) in enumerate(zip(flat, leaves)):
        named[f"arr_{i:04d}"] = np.asarray(leaf)
        named[f"name_{i:04d}"] = np.bytes_(jax.tree_util.keystr(kp))
    np.savez(path, **named)


def load_params(path: str, template):
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(template)
    loaded = []
    for i, leaf in enumerate(leaves):
        arr = data[f"arr_{i:04d}"]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"param {i} shape mismatch: file {arr.shape} vs template {np.shape(leaf)}"
            )
        loaded.append(arr)
    return jax.tree_util.tree_unflatten(treedef, loaded)
