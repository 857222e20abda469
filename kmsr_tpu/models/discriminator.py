"""Fully-convolutional patch discriminator with spectral normalization.

Capability parity with the reference `PatchDiscriminator`
(`single_kernel/networks.py:171-207`): a 7x7 spectrally-normalized conv ->
LeakyReLU(0.2) -> `num_blocks` x (1x1 SN conv + BatchNorm + LeakyReLU) ->
1x1 SN conv, emitting a per-pixel realness map [B, 1, H, W].

Functional JAX design: parameters and mutable state (power-iteration `u`
vectors, BN running stats) are explicit pytrees threaded through `apply`,
so the whole D step jits/pjits cleanly — spectral norm's power iteration
is one matvec pair inside the compiled step, not a host-side hook.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

_SN_EPS = 1e-12
_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1
LEAKY_SLOPE = 0.2


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    in_ch: int = 5
    base_ch: int = 64
    num_blocks: int = 4


def _conv_init(key, out_c, in_c, k):
    """Kaiming-uniform fan-in init (torch Conv2d default: bound=1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(key)
    fan_in = in_c * k * k
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(wkey, (out_c, in_c, k, k), minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (out_c,), minval=-bound, maxval=bound)
    return w, b


def init_discriminator(
    key: jax.Array, cfg: DiscriminatorConfig = DiscriminatorConfig()
) -> Tuple[dict, dict]:
    """Returns (params, state). state = {sn u vectors, bn running stats}."""
    keys = jax.random.split(key, cfg.num_blocks + 2)
    params: dict = {"convs": [], "bn_scale": [], "bn_bias": []}
    state: dict = {"u": [], "bn_mean": [], "bn_var": []}

    def add_conv(k_, out_c, in_c, ksize):
        w, b = _conv_init(k_, out_c, in_c, ksize)
        params["convs"].append({"w": w, "b": b})
        u0 = jax.random.normal(jax.random.fold_in(k_, 1), (out_c,))
        state["u"].append(u0 / (jnp.linalg.norm(u0) + _SN_EPS))

    add_conv(keys[0], cfg.base_ch, cfg.in_ch, 7)
    for i in range(cfg.num_blocks):
        add_conv(keys[1 + i], cfg.base_ch, cfg.base_ch, 1)
        params["bn_scale"].append(jnp.ones((cfg.base_ch,)))
        params["bn_bias"].append(jnp.zeros((cfg.base_ch,)))
        state["bn_mean"].append(jnp.zeros((cfg.base_ch,)))
        state["bn_var"].append(jnp.ones((cfg.base_ch,)))
    add_conv(keys[-1], 1, cfg.base_ch, 1)
    return params, state


def _spectral_normalize(w: jax.Array, u: jax.Array, update: bool):
    """One power-iteration step; returns (w / sigma, new_u)."""
    out_c = w.shape[0]
    w_mat = w.reshape(out_c, -1)
    v = w_mat.T @ u
    v = v / (jnp.linalg.norm(v) + _SN_EPS)
    u_new = w_mat @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + _SN_EPS)
    u_used = u_new if update else u
    v_used = w_mat.T @ u_used
    v_used = v_used / (jnp.linalg.norm(v_used) + _SN_EPS)
    sigma = jnp.dot(u_used, w_mat @ v_used)
    w_sn = w / (sigma + _SN_EPS)
    new_u = jax.lax.stop_gradient(u_new) if update else u
    return w_sn, new_u


def _conv(x, w, b, pad):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + b[None, :, None, None]


def _batch_norm(x, scale, bias, mean_run, var_run, train: bool):
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_mean = (1 - _BN_MOMENTUM) * mean_run + _BN_MOMENTUM * mean
        new_var = (1 - _BN_MOMENTUM) * var_run + _BN_MOMENTUM * unbiased
    else:
        mean, var = mean_run, var_run
        new_mean, new_var = mean_run, var_run
    inv = jax.lax.rsqrt(var + _BN_EPS)
    y = (x - mean[None, :, None, None]) * inv[None, :, None, None]
    y = y * scale[None, :, None, None] + bias[None, :, None, None]
    return y, jax.lax.stop_gradient(new_mean), jax.lax.stop_gradient(new_var)


def discriminator_forward(
    params: dict, state: dict, x: jax.Array, train: bool = True
) -> Tuple[jax.Array, dict]:
    """x: [B, C, H, W] -> (score map [B, 1, H, W], new_state)."""
    new_state: dict = {"u": [], "bn_mean": [], "bn_var": []}
    convs = params["convs"]
    n_blocks = len(params["bn_scale"])

    def sn_conv(i, h, pad):
        w_sn, u_new = _spectral_normalize(convs[i]["w"], state["u"][i], train)
        new_state["u"].append(u_new)
        return _conv(h, w_sn, convs[i]["b"], pad)

    h = sn_conv(0, x, 3)
    h = jax.nn.leaky_relu(h, LEAKY_SLOPE)
    for i in range(n_blocks):
        h = sn_conv(1 + i, h, 0)
        h, m, v = _batch_norm(
            h,
            params["bn_scale"][i],
            params["bn_bias"][i],
            state["bn_mean"][i],
            state["bn_var"][i],
            train,
        )
        new_state["bn_mean"].append(m)
        new_state["bn_var"].append(v)
        h = jax.nn.leaky_relu(h, LEAKY_SLOPE)
    h = sn_conv(1 + n_blocks, h, 0)
    return h, new_state
