"""Mixture-of-experts kernel bank (content-adaptive degradation).

Capability parity with `muti_kernel/train_gemini.py:14-140`: a light CNN
selector produces 10 logits; Gumbel-softmax (annealed temperature, hard
option) mixes a learnable kernel bank [K, C, 13, 13] (spatial softmax ->
nonneg, band-sum 1) and sigma bank [K, C] (softplus); the mixed per-sample
kernels degrade the input (SAME zero padding, ::4 decimation — the MoE
variant's choices) and Gaussian noise scaled by the mixed sigma is added.

TPU-first: the per-sample depthwise conv is the patch-einsum op
(`ops.degrade.degrade_batch_kernels`) instead of the reference's
batch-as-groups reshape trick; selection and mixing are einsums as in the
reference (already array-native).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.degrade import degrade_batch_kernels


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    n_kernels: int = 10
    n_channels: int = 5
    kernel_size: int = 13
    factor: int = 4          # reference decimates ::4 (`train_gemini.py:134`)
    sigma_init: float = 0.5


# ---------------------------------------------------------------- selector
def init_selector(key: jax.Array, cfg: MoEConfig) -> tuple[dict, dict]:
    """Light CNN classifier; returns (params, bn_state)."""
    chans = [(32, cfg.n_channels), (64, 32), (128, 64)]
    params: dict = {"convs": [], "bn_scale": [], "bn_bias": []}
    state: dict = {"bn_mean": [], "bn_var": []}
    for i, (out_c, in_c) in enumerate(chans):
        k = jax.random.fold_in(key, i)
        kw, kb = jax.random.split(k)
        bound = 1.0 / jnp.sqrt(in_c * 9)
        params["convs"].append(
            {
                "w": jax.random.uniform(kw, (out_c, in_c, 3, 3), minval=-bound, maxval=bound),
                "b": jax.random.uniform(kb, (out_c,), minval=-bound, maxval=bound),
            }
        )
        params["bn_scale"].append(jnp.ones((out_c,)))
        params["bn_bias"].append(jnp.zeros((out_c,)))
        state["bn_mean"].append(jnp.zeros((out_c,)))
        state["bn_var"].append(jnp.ones((out_c,)))
    kf = jax.random.fold_in(key, 99)
    kw, kb = jax.random.split(kf)
    bound = 1.0 / jnp.sqrt(128.0)
    params["fc_w"] = jax.random.uniform(kw, (cfg.n_kernels, 128), minval=-bound, maxval=bound)
    params["fc_b"] = jax.random.uniform(kb, (cfg.n_kernels,), minval=-bound, maxval=bound)
    return params, state


def selector_forward(
    params: dict, state: dict, x: jax.Array, train: bool = True
) -> tuple[jax.Array, dict]:
    """x: [B, C, H, W] -> (logits [B, K], new bn state)."""
    new_state: dict = {"bn_mean": [], "bn_var": []}
    h = x
    for i, conv in enumerate(params["convs"]):
        h = jax.lax.conv_general_dilated(
            h, conv["w"], (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + conv["b"][None, :, None, None]
        if train:
            mean = jnp.mean(h, axis=(0, 2, 3))
            var = jnp.var(h, axis=(0, 2, 3))
            n = h.shape[0] * h.shape[2] * h.shape[3]
            new_state["bn_mean"].append(
                jax.lax.stop_gradient(0.9 * state["bn_mean"][i] + 0.1 * mean)
            )
            new_state["bn_var"].append(
                jax.lax.stop_gradient(
                    0.9 * state["bn_var"][i] + 0.1 * var * n / max(n - 1, 1)
                )
            )
        else:
            mean, var = state["bn_mean"][i], state["bn_var"][i]
            new_state["bn_mean"].append(mean)
            new_state["bn_var"].append(var)
        inv = jax.lax.rsqrt(var + 1e-5)
        h = (h - mean[None, :, None, None]) * inv[None, :, None, None]
        h = h * params["bn_scale"][i][None, :, None, None] + params["bn_bias"][i][None, :, None, None]
        h = jax.nn.relu(h)
    feat = jnp.mean(h, axis=(2, 3))  # GAP [B, 128]
    logits = feat @ params["fc_w"].T + params["fc_b"]
    return logits, new_state


# ---------------------------------------------------------------- banks
def init_moe(key: jax.Array, cfg: MoEConfig = MoEConfig()) -> tuple[dict, dict]:
    k_sel, k_bank = jax.random.split(key)
    sel_params, sel_state = init_selector(k_sel, cfg)
    c = cfg.kernel_size // 2
    bank = jnp.zeros((cfg.n_kernels, cfg.n_channels, cfg.kernel_size, cfg.kernel_size))
    bank = bank.at[:, :, c, c].set(1.0)
    bank = bank + jax.random.normal(k_bank, bank.shape) * 0.01
    params = {
        "selector": sel_params,
        "kernel_bank": bank,
        "sigma_bank": jnp.full((cfg.n_kernels, cfg.n_channels), cfg.sigma_init),
    }
    return params, {"selector": sel_state}


def effective_kernels(params: dict) -> jax.Array:
    """Spatial-softmax kernels: nonneg, each band sums to 1. [K,C,kh,kw]."""
    bank = params["kernel_bank"]
    k, c, kh, kw = bank.shape
    flat = bank.reshape(k, c, kh * kw)
    return jax.nn.softmax(flat, axis=-1).reshape(k, c, kh, kw)


def effective_sigmas(params: dict) -> jax.Array:
    return jax.nn.softplus(params["sigma_bank"])


def gumbel_softmax(
    key: jax.Array, logits: jax.Array, tau: float, hard: bool = False
) -> jax.Array:
    u = jax.random.uniform(key, logits.shape, minval=1e-10, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y


def moe_forward(
    params: dict,
    state: dict,
    key: jax.Array,
    x: jax.Array,
    temp: float | jax.Array = 1.0,
    hard: bool = False,
    train: bool = True,
    cfg: MoEConfig = MoEConfig(),
):
    """Returns (degraded [B,C,H/f,W/f], weights [B,K], kernels [K,C,kh,kw],
    new_state)."""
    k_gumbel, k_noise = jax.random.split(key)
    logits, sel_state = selector_forward(params["selector"], state["selector"], x, train)
    weights = gumbel_softmax(k_gumbel, logits, temp, hard)
    valid_kernels = effective_kernels(params)
    valid_sigmas = effective_sigmas(params)
    batch_kernels = jnp.einsum("bk,kchw->bchw", weights, valid_kernels)
    batch_sigmas = jnp.einsum("bk,kc->bc", weights, valid_sigmas)
    out = degrade_batch_kernels(x, batch_kernels, factor=cfg.factor, decimate=True)
    noise = jax.random.normal(k_noise, out.shape) * batch_sigmas[:, :, None, None]
    return out + noise, weights, valid_kernels, {"selector": sel_state}
