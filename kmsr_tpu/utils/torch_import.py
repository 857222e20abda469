"""Import the reference's trained torch checkpoints.

The reference ships `moe_kernels/moe_model.pth` — a torch state_dict of
its content-adaptive degradation model (selector CNN + kernel/sigma banks,
saved at `muti_kernel/train_gemini.py:252`). This module maps that
artifact onto `kmsr_tpu.models.moe` parameters so a user can run the
reference's trained MoE selector/banks directly on TPU.

Key layout of the reference checkpoint (inspected, not copied):
  kernel_bank [K,C,13,13], sigma_bank [K,C]  — raw banks (softmax/softplus
    are applied at use time, matching `get_effective_kernels`/sigma)
  selector.features.{0,3,6}.{weight,bias}    — stride-2 convs (OIHW)
  selector.features.{1,4,7}.*                — BatchNorm2d affine + running
  selector.classifier.{weight,bias}          — final Linear -> K logits

Both frameworks use cross-correlation convs with padding 1 / stride 2, so
weights transfer without flipping or transposition.
"""
from __future__ import annotations

import numpy as np

from ..models.moe import MoEConfig


def load_moe_torch_checkpoint(
    path: str, cfg: MoEConfig | None = MoEConfig()
) -> tuple[dict, dict]:
    """Load a reference `moe_model.pth` into (params, state) consumable by
    `models.moe.moe_forward`. Requires torch (CPU) for deserialization.

    cfg=None infers (n_kernels, n_channels) from the checkpoint's bank
    instead of validating against an expected config."""
    import jax.numpy as jnp
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)

    def arr(key):
        return jnp.asarray(np.asarray(sd[key], dtype=np.float32))

    convs, bn_scale, bn_bias, bn_mean, bn_var = [], [], [], [], []
    for conv_i, bn_i in ((0, 1), (3, 4), (6, 7)):
        convs.append(
            {
                "w": arr(f"selector.features.{conv_i}.weight"),
                "b": arr(f"selector.features.{conv_i}.bias"),
            }
        )
        bn_scale.append(arr(f"selector.features.{bn_i}.weight"))
        bn_bias.append(arr(f"selector.features.{bn_i}.bias"))
        bn_mean.append(arr(f"selector.features.{bn_i}.running_mean"))
        bn_var.append(arr(f"selector.features.{bn_i}.running_var"))

    params = {
        "selector": {
            "convs": convs,
            "bn_scale": bn_scale,
            "bn_bias": bn_bias,
            "fc_w": arr("selector.classifier.weight"),
            "fc_b": arr("selector.classifier.bias"),
        },
        "kernel_bank": arr("kernel_bank"),
        "sigma_bank": arr("sigma_bank"),
    }
    state = {"selector": {"bn_mean": bn_mean, "bn_var": bn_var}}

    k, c = params["kernel_bank"].shape[:2]
    if cfg is not None and (k, c) != (cfg.n_kernels, cfg.n_channels):
        raise ValueError(
            f"checkpoint banks are [{k},{c}], config expects "
            f"[{cfg.n_kernels},{cfg.n_channels}]"
        )
    return params, state
