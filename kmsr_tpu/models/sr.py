"""Super-resolution CNN (framework extension — the reference repo ships
only the kernel-modeling data factory; its SR network is out-of-repo, see
SURVEY.md section 0. The BASELINE north star nevertheless requires an SR
inference path: >= 200 Mpix/s at x8 on one chip).

Architecture: compact EDSR-style residual trunk + pixel-shuffle upsampler
(x2 stages), bias convs, residual scaling, and a global skip through
bilinear upsampling so the net learns the residual detail. bf16-friendly:
`sr_forward(..., compute_dtype=jnp.bfloat16)` runs the trunk on the MXU in
bf16 with f32 params and f32 output.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SRConfig:
    in_ch: int = 5
    width: int = 64
    n_blocks: int = 8
    factor: int = 8              # total upscale (power of 2)
    res_scale: float = 0.1


def _conv_init(key, out_c, in_c, k):
    bound = 1.0 / np.sqrt(in_c * k * k)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_c, in_c, k, k), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_c,), minval=-bound, maxval=bound),
    }


def init_sr(key: jax.Array, cfg: SRConfig = SRConfig()) -> dict:
    n_up = int(np.log2(cfg.factor))
    keys = jax.random.split(key, 3 + 2 * cfg.n_blocks + n_up)
    params = {
        "head": _conv_init(keys[0], cfg.width, cfg.in_ch, 3),
        "blocks": [],
        "body_tail": _conv_init(keys[1], cfg.width, cfg.width, 3),
        "ups": [],
        "tail": _conv_init(keys[2], cfg.in_ch, cfg.width, 3),
    }
    for i in range(cfg.n_blocks):
        params["blocks"].append(
            {
                "c1": _conv_init(keys[3 + 2 * i], cfg.width, cfg.width, 3),
                "c2": _conv_init(keys[4 + 2 * i], cfg.width, cfg.width, 3),
            }
        )
    for i in range(n_up):
        params["ups"].append(
            _conv_init(keys[3 + 2 * cfg.n_blocks + i], cfg.width * 4, cfg.width, 3)
        )
    return params


def _conv(x, p, dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=dtype,
    )
    return y + p["b"].astype(dtype)[None, :, None, None]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """[B, C*r^2, H, W] -> [B, C, H*r, W*r]."""
    b, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, c, h * r, w * r)


def bilinear_upsample(x: jax.Array, factor: int) -> jax.Array:
    b, c, h, w = x.shape
    return jax.image.resize(
        x, (b, c, h * factor, w * factor), method="bilinear"
    )


def sr_forward(
    params: dict,
    x: jax.Array,
    cfg: SRConfig = SRConfig(),
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x: [B, C, h, w] -> [B, C, h*factor, w*factor] (f32 output)."""
    dt = compute_dtype
    skip = bilinear_upsample(x, cfg.factor)
    h = _conv(x, params["head"], dt)
    body = h
    for blk in params["blocks"]:
        r = jax.nn.relu(_conv(body, blk["c1"], dt))
        r = _conv(r, blk["c2"], dt)
        body = body + cfg.res_scale * r
    body = _conv(body, params["body_tail"], dt) + h
    up = body
    for p_up in params["ups"]:
        up = pixel_shuffle(_conv(up, p_up, dt), 2)
    out = _conv(up, params["tail"], dt)
    return out.astype(jnp.float32) + skip


def count_params(params: dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
