"""Content-conditioned (dynamic) degradation model.

Capability parity with `muti_kernel/networks.py`: a light CNN condition
encoder emits per-band x per-layer x per-out-channel scale factors
(`1 + 0.1*tanh`, ~[0.9, 1.1]), which modulate a bank of learnable
deep-linear conv-chain weights per sample; a learnable per-channel noise
sigma (clamped exp) adds Gaussian noise to the degraded output.

TPU-first: the reference loops Python over batch x band
(`networks.py:119-133` — its per-sample conv chains never batch); here the
modulated chain is `vmap`ped over batch AND band, so the whole forward is
one XLA computation with batched convs. Effective-kernel extraction is the
closed-form composition (vmapped over batch/band), replacing the
per-sample Python composition loop (`networks.py:163-198`).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.degrade import block_mean
from ..ops.kernel_algebra import compose_chain

DEFAULT_KS = (7, 5, 3, 1, 1, 1)


@dataclasses.dataclass(frozen=True)
class DynamicConfig:
    in_ch: int = 5
    mid_ch: int = 32
    ks: Sequence[int] = DEFAULT_KS
    scale_gain: float = 0.1
    factor: int = 8
    noise_init: float = 0.3
    noise_max: float = 1.2

    @property
    def layer_out_channels(self) -> list[int]:
        return [self.mid_ch] * (len(self.ks) - 1) + [1]

    @property
    def total_scales(self) -> int:
        return self.in_ch * sum(self.layer_out_channels)


# ---------------------------------------------------------------- encoder
def init_condition_encoder(key: jax.Array, cfg: DynamicConfig) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def conv_init(k, out_c, in_c, ksize):
        bound = 1.0 / jnp.sqrt(in_c * ksize * ksize)
        kw, kb = jax.random.split(k)
        return {
            "w": jax.random.uniform(kw, (out_c, in_c, ksize, ksize), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (out_c,), minval=-bound, maxval=bound),
        }

    fb = 1.0 / jnp.sqrt(64.0)
    kw, kb = jax.random.split(k4)
    return {
        "conv1": conv_init(k1, 32, cfg.in_ch, 3),
        "conv2": conv_init(k2, 64, 32, 3),
        "conv3": conv_init(k3, 64, 64, 3),
        "fc_w": jax.random.uniform(kw, (cfg.total_scales, 64), minval=-fb, maxval=fb),
        "fc_b": jax.random.uniform(kb, (cfg.total_scales,), minval=-fb, maxval=fb),
    }


def _conv(x, p, stride, pad):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["b"][None, :, None, None]


def condition_encoder_forward(params: dict, x: jax.Array, cfg: DynamicConfig) -> jax.Array:
    """x: [B, C, H, W] -> raw scale logits [B, total_scales]."""
    h = jax.nn.relu(_conv(x, params["conv1"], 1, 1))
    h = jax.nn.relu(_conv(h, params["conv2"], 2, 1))
    h = jax.nn.relu(_conv(h, params["conv3"], 2, 1))
    h = jnp.mean(h, axis=(2, 3))  # GAP -> [B, 64]
    return h @ params["fc_w"].T + params["fc_b"]


def split_scales(raw: jax.Array, cfg: DynamicConfig) -> list[list[jax.Array]]:
    """[B, total] -> scales[band][layer] of [B, out_c], each 1+gain*tanh."""
    scales: list[list[jax.Array]] = []
    start = 0
    for _ in range(cfg.in_ch):
        band: list[jax.Array] = []
        for out_c in cfg.layer_out_channels:
            s = 1.0 + cfg.scale_gain * jnp.tanh(raw[:, start : start + out_c])
            band.append(s)
            start += out_c
        scales.append(band)
    return scales


# ---------------------------------------------------------------- generator
def init_dynamic_generator(key: jax.Array, cfg: DynamicConfig = DynamicConfig()) -> dict:
    keys = jax.random.split(key, 2)
    layers = []
    in_c = 1
    for i, (ksize, out_c) in enumerate(zip(cfg.ks, cfg.layer_out_channels)):
        k = jax.random.fold_in(keys[0], i)
        w = jax.random.normal(k, (cfg.in_ch, out_c, in_c, ksize, ksize)) * 0.01
        layers.append(w)
        in_c = out_c
    return {
        "layers": layers,  # [band, out, in, k, k] per layer
        "encoder": init_condition_encoder(keys[1], cfg),
    }


def _modulated_chain(ws, scales, x):
    """One (sample, band) chain. ws: [(out,in,k,k)], scales: [(out,)],
    x: [1, H, W] -> [1, H, W]."""
    h = x[None]  # [1, 1, H, W]
    for w, s in zip(ws, scales):
        wmod = w * s[:, None, None, None]
        k = w.shape[-1]
        if k > 1:
            p = k // 2
            h = jnp.pad(h, [(0, 0), (0, 0), (p, p), (p, p)], mode="reflect")
        h = jax.lax.conv_general_dilated(
            h, wmod, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
    return h[0]


def dynamic_generator_forward(params: dict, x: jax.Array, cfg: DynamicConfig = DynamicConfig()) -> jax.Array:
    """x: [B, C, H, W] -> [B, C, H/f, W/f] with per-sample dynamic kernels."""
    raw = condition_encoder_forward(params["encoder"], x, cfg)
    scales = split_scales(raw, cfg)  # [band][layer] of [B, out_c]

    # stack to [band][layer] arrays for vmap: band axis 0 of params layers
    def per_band(band_ws, band_scales, xb):
        # band_ws: [(out,in,k,k)]; band_scales: [(B,out)]; xb: [B, 1, H, W]
        def per_sample(sample_scales, xs):
            return _modulated_chain(band_ws, sample_scales, xs)

        return jax.vmap(per_sample)(band_scales, xb)  # [B, 1, H, W]

    outs = []
    for band in range(cfg.in_ch):
        band_ws = [w[band] for w in params["layers"]]
        band_scales = scales[band]
        xb = x[:, band : band + 1]
        outs.append(per_band(band_ws, band_scales, xb))
    y = jnp.concatenate(outs, axis=1)  # [B, C, H, W]
    return block_mean(y, cfg.factor)


def extract_dynamic_kernels(
    params: dict,
    x: jax.Array | None = None,
    cfg: DynamicConfig = DynamicConfig(),
    reduce_batch: bool = True,
    differentiable: bool = False,
) -> jax.Array:
    """Per-sample effective kernels [B, C, KH, KW] (or batch mean [C, KH, KW]).

    With x=None, unit scales are used (unmodulated bank). Default
    non-differentiable (reference quirk parity, `networks.py:135`).
    """
    if x is None:
        b = 1
        scales = [
            [jnp.ones((1, oc)) for oc in cfg.layer_out_channels]
            for _ in range(cfg.in_ch)
        ]
    else:
        b = x.shape[0]
        raw = condition_encoder_forward(params["encoder"], x, cfg)
        scales = split_scales(raw, cfg)

    def one(band_ws, sample_scales):
        ws = [w * s[:, None, None, None] for w, s in zip(band_ws, sample_scales)]
        k = compose_chain(ws).mean(axis=(0, 1))
        k = jnp.clip(k, 0.0, None)
        ksum = jnp.sum(k)
        ksum = jnp.where(ksum <= 1e-12, 1.0, ksum)
        return k / ksum

    bands = []
    for band in range(cfg.in_ch):
        band_ws = [w[band] for w in params["layers"]]
        band_scales = scales[band]  # [layer] of [B, out]
        ks = jax.vmap(lambda *ss: one(band_ws, list(ss)))(*band_scales)  # [B,KH,KW]
        bands.append(ks)
    kernels = jnp.stack(bands, axis=1)  # [B, C, KH, KW]
    if reduce_batch:
        kernels = kernels.mean(axis=0)
    return kernels if differentiable else jax.lax.stop_gradient(kernels)


# ---------------------------------------------------------------- noise
def init_noise_estimator(cfg: DynamicConfig = DynamicConfig()) -> dict:
    return {"log_sigma": jnp.log(jnp.full((cfg.in_ch,), cfg.noise_init))}


def noise_sigma(params: dict, cfg: DynamicConfig = DynamicConfig()) -> jax.Array:
    return jnp.clip(jnp.exp(params["log_sigma"]), 1e-5, cfg.noise_max)


def add_estimated_noise(
    params: dict, key: jax.Array, x: jax.Array, cfg: DynamicConfig = DynamicConfig()
) -> tuple[jax.Array, jax.Array]:
    sigma = noise_sigma(params, cfg)
    noise = jax.random.normal(key, x.shape) * sigma[None, :, None, None]
    return x + noise, sigma


# ---------------------------------------------------------------- composite
def init_degradation_model(key: jax.Array, cfg: DynamicConfig = DynamicConfig()) -> dict:
    return {
        "generator": init_dynamic_generator(key, cfg),
        "noise": init_noise_estimator(cfg),
    }


def degradation_model_forward(
    params: dict, key: jax.Array, x: jax.Array, cfg: DynamicConfig = DynamicConfig()
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (clean, noisy, sigma) — `DegradationModel.forward` parity."""
    clean = dynamic_generator_forward(params["generator"], x, cfg)
    noisy, sigma = add_estimated_noise(params["noise"], key, clean, cfg)
    return clean, noisy, sigma
