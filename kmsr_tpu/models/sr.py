"""Super-resolution CNN (framework extension — the reference repo ships
only the kernel-modeling data factory; its SR network is out-of-repo, see
SURVEY.md section 0. The BASELINE north star nevertheless requires an SR
inference path: >= 200 Mpix/s at x8 on one chip).

Architecture: compact EDSR-style residual trunk + subpixel (pixel-shuffle)
upsampler and a global bilinear skip, designed TPU-first:

- **NHWC internally** (channel-last is the MXU-native conv layout; the
  public API stays channel-first ``[B, C, H, W]`` to match the rest of the
  framework's data model), weights stored HWIO.
- **bf16 trunk** on the MXU with f32 params and f32 output.
- **Bilinear skip as two matmuls**: x8 bilinear interpolation is a fixed
  linear map per axis, so the skip is ``R_h @ x @ R_w^T`` on the MXU
  instead of a gather-based ``jax.image.resize`` (measured ~2x cheaper).
- Two upsampler variants (``SRConfig.upsampler``):
  * ``"progressive"`` (default): x2 pixel-shuffle stages with the final
    projection folded into the last stage — the output conv runs at
    ``factor/2`` resolution producing ``in_ch*4`` subpixel channels, so no
    conv ever touches full-resolution feature maps.
  * ``"oneshot"``: a single ``width -> in_ch*factor^2`` conv at LR followed
    by one shuffle (ESPCN-style). All FLOPs stay at LR resolution with
    MXU-friendly channel counts — measured ~1.8x faster than progressive
    (~1.7 Gpix/s on v5e at batch 256) at some quality cost for large
    factors.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SRConfig:
    in_ch: int = 5
    width: int = 64
    n_blocks: int = 8
    factor: int = 8              # total upscale (power of 2 for progressive)
    res_scale: float = 0.1
    upsampler: str = "progressive"  # "progressive" | "oneshot"


def _conv_init(key, k, in_c, out_c):
    """HWIO conv weights + bias, uniform fan-in init."""
    bound = 1.0 / np.sqrt(in_c * k * k)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (k, k, in_c, out_c), minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_c,), minval=-bound, maxval=bound),
    }


def init_sr(key: jax.Array, cfg: SRConfig = SRConfig()) -> dict:
    n_up = int(np.log2(cfg.factor))
    if cfg.upsampler == "progressive" and 2**n_up != cfg.factor:
        raise ValueError(f"progressive upsampler needs power-of-2 factor, got {cfg.factor}")
    keys = jax.random.split(key, 3 + 2 * cfg.n_blocks + max(n_up, 1))
    params = {
        "head": _conv_init(keys[0], 3, cfg.in_ch, cfg.width),
        "blocks": [],
        "body_tail": _conv_init(keys[1], 3, cfg.width, cfg.width),
        "ups": [],
    }
    for i in range(cfg.n_blocks):
        params["blocks"].append(
            {
                "c1": _conv_init(keys[3 + 2 * i], 3, cfg.width, cfg.width),
                "c2": _conv_init(keys[4 + 2 * i], 3, cfg.width, cfg.width),
            }
        )
    up_keys = keys[3 + 2 * cfg.n_blocks :]
    if cfg.upsampler == "oneshot":
        params["tail"] = _conv_init(
            keys[2], 3, cfg.width, cfg.in_ch * cfg.factor * cfg.factor
        )
    else:
        for i in range(n_up - 1):
            params["ups"].append(_conv_init(up_keys[i], 3, cfg.width, cfg.width * 4))
        # final projection at factor/2 resolution: width -> in_ch*4 subpixels
        params["tail"] = _conv_init(keys[2], 3, cfg.width, cfg.in_ch * 4)
    return params


def _conv(x, p, dtype):
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    return y + p["b"].astype(dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """[B, C*r^2, H, W] -> [B, C, H*r, W*r] (channel-first public helper)."""
    b, crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(b, c, r, r, h, w)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, c, h * r, w * r)


def _pixel_shuffle_nhwc(x: jax.Array, r: int) -> jax.Array:
    """[B, H, W, C*r^2] -> [B, H*r, W*r, C]; channel layout matches the
    channel-first `pixel_shuffle` (c-major, then row subpixel, then col)."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)


@functools.lru_cache(maxsize=32)
def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic [n_out, n_in] matrix implementing half-pixel-centers
    bilinear resampling along one axis (matches `jax.image.resize`)."""
    scale = n_in / n_out
    m = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        i0 = int(np.floor(src))
        f = src - i0
        m[o, min(max(i0, 0), n_in - 1)] += 1.0 - f
        m[o, min(max(i0 + 1, 0), n_in - 1)] += f
    return m


def bilinear_upsample(x: jax.Array, factor: int) -> jax.Array:
    """[B, C, H, W] bilinear x`factor` via per-axis interpolation matmuls
    (MXU path; equivalent to jax.image.resize(..., "bilinear")).

    HIGHEST precision: this is the PSNR/SSIM BASELINE and eval skip —
    TPU default matmul precision (one bf16 pass) measured 6e-3 max rel
    vs the host (scripts/tpu_parity.py), enough to bias reported
    baseline dB. The model's own bf16 skip (`_skip_nhwc`) keeps the
    default: its precision is part of the trained compute dtype."""
    b, c, h, w = x.shape
    rh = jnp.asarray(_bilinear_matrix(h, h * factor))
    rw = jnp.asarray(_bilinear_matrix(w, w * factor))
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("Oh,bchw->bcOw", rh, x, precision=hp)
    return jnp.einsum("Pw,bchw->bchP", rw, y, precision=hp)


def _skip_nhwc(x: jax.Array, factor: int, dtype) -> jax.Array:
    b, h, w, c = x.shape
    rh = jnp.asarray(_bilinear_matrix(h, h * factor), dtype)
    rw = jnp.asarray(_bilinear_matrix(w, w * factor), dtype)
    y = jnp.einsum("Oh,bhwc->bOwc", rh, x.astype(dtype))
    return jnp.einsum("Pw,bhwc->bhPc", rw, y)


def sr_forward(
    params: dict,
    x: jax.Array,
    cfg: SRConfig = SRConfig(),
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """x: [B, C, h, w] -> [B, C, h*factor, w*factor] (f32 output)."""
    dt = compute_dtype
    x = jnp.transpose(x, (0, 2, 3, 1))  # -> NHWC
    skip = _skip_nhwc(x, cfg.factor, dt).astype(jnp.float32)
    h = _conv(x, params["head"], dt)
    body = h
    for blk in params["blocks"]:
        r = jax.nn.relu(_conv(body, blk["c1"], dt))
        r = _conv(r, blk["c2"], dt)
        body = body + cfg.res_scale * r
    body = _conv(body, params["body_tail"], dt) + h
    if cfg.upsampler == "oneshot":
        out = _pixel_shuffle_nhwc(_conv(body, params["tail"], dt), cfg.factor)
    else:
        up = body
        for p_up in params["ups"]:
            up = _pixel_shuffle_nhwc(_conv(up, p_up, dt), 2)
        out = _pixel_shuffle_nhwc(_conv(up, params["tail"], dt), 2)
    out = out.astype(jnp.float32) + skip
    return jnp.transpose(out, (0, 3, 1, 2))  # -> NCHW


def count_params(params: dict) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
