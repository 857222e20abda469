"""GAN losses and kernel regularizers (pure functions).

Parity targets: LSGAN D/G losses (`single_kernel/loss.py:5-31`), the 5-term
kernel regularizer — sum-to-1, boundary, sqrt-sparsity, centroid-to-center,
center-must-be-max (`single_kernel/loss.py:34-94`) — its 4-term variant
without CenterMax (`muti_kernel/loss.py:16-38`), and the noise-sigma
regularizer (`muti_kernel/loss.py:41-51`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lsgan_d_loss(pred_real: jax.Array, pred_fake: jax.Array) -> jax.Array:
    """0.5*mean[(D(real)-1)^2] + 0.5*mean[D(fake)^2]."""
    return 0.5 * jnp.mean((pred_real - 1.0) ** 2) + 0.5 * jnp.mean(pred_fake**2)


def lsgan_g_loss(pred_fake: jax.Array) -> jax.Array:
    """0.5*mean[(D(fake)-1)^2]."""
    return 0.5 * jnp.mean((pred_fake - 1.0) ** 2)


def kernel_regularization(
    k: jax.Array,
    alpha: float = 0.5,
    beta: float = 0.5,
    gamma: float = 5.0,
    delta: float = 1.0,
    epsilon: float = 2.0,
    center_max: bool = True,
) -> jax.Array:
    """Physicality regularizer on a 2-D blur kernel.

    Terms: alpha*(sum-1)^2 + beta*boundary-energy + gamma*sum(sqrt(k)) +
    delta*centroid-offset^2 + epsilon*(max - center)^2. Set
    `center_max=False` for the 4-term variant used by the dynamic model.
    """
    kh, kw = k.shape
    sum1 = (jnp.sum(k) - 1.0) ** 2
    boundaries = (
        jnp.sum(k[0] ** 2)
        + jnp.sum(k[-1] ** 2)
        + jnp.sum(k[:, 0] ** 2)
        + jnp.sum(k[:, -1] ** 2)
    )
    # sqrt with a zero (not inf) gradient at 0, so the differentiable
    # kernel-extraction path stays NaN-free; values are exact.
    k_pos = jnp.clip(k, 0.0, None)
    sparse = jnp.sum(
        jnp.where(k_pos > 0, jnp.sqrt(jnp.where(k_pos > 0, k_pos, 1.0)), 0.0)
    )
    yy, xx = jnp.meshgrid(jnp.arange(kh), jnp.arange(kw), indexing="ij")
    mass = jnp.clip(k, 0.0, None) + 1e-12
    msum = jnp.sum(mass)
    cy = jnp.sum(yy * mass) / msum
    cx = jnp.sum(xx * mass) / msum
    c_y, c_x = (kh - 1) / 2.0, (kw - 1) / 2.0
    center = (cy - c_y) ** 2 + (cx - c_x) ** 2
    loss = alpha * sum1 + beta * boundaries + gamma * sparse + delta * center
    if center_max:
        center_val = k[int(c_y), int(c_x)]
        loss = loss + epsilon * (jnp.max(k) - center_val) ** 2
    return loss


def per_band_kernel_regularization(
    kernels: jax.Array, weights: dict | None = None, center_max: bool = True
) -> jax.Array:
    """Mean of the regularizer over the band axis. kernels: [C, kH, kW].

    Default weights match the single-kernel training loop
    (`single_kernel/train.py:288-296`): alpha=.5 beta=.5 gamma=5 delta=1
    epsilon=3.
    """
    w = dict(alpha=0.5, beta=0.5, gamma=5.0, delta=1.0, epsilon=3.0)
    if weights:
        w.update(weights)
    reg = jax.vmap(
        lambda k: kernel_regularization(k, center_max=center_max, **w)
    )(kernels)
    return jnp.mean(reg)


def noise_reg_loss(
    sigma: jax.Array, target: jax.Array | float = 0.01, mode: str = "l2"
) -> jax.Array:
    """Penalize per-band noise sigma away from a target level."""
    t = jnp.asarray(target, dtype=sigma.dtype)
    if mode == "l1":
        return jnp.mean(jnp.abs(sigma - t))
    return jnp.mean((sigma - t) ** 2)


def load_balance_loss(weights: jax.Array) -> jax.Array:
    """Switch-style auxiliary load-balance loss on routing weights [B, K].

    K * sum_k f_k * P_k with f_k the (stop-gradient) fraction of the batch
    hard-routed to expert k and P_k the mean soft routing probability.
    Equals 1 at uniform routing and approaches K when every sample routes
    to one expert, so minimizing it pushes the selector's probability mass
    off overloaded experts. The reference has no such term
    (`train_gemini.py:182,195` trains soft Gumbel only, and its shipped
    `moe_kernels/` bank is measurably collapsed — pairwise kernel L2 mean
    0.003); this is the opt-in mitigation (`MoETrainConfig.balance_weight`)
    for bank collapse on degradation-homogeneous data.
    """
    k = weights.shape[-1]
    hard = jax.nn.one_hot(
        jnp.argmax(weights, axis=-1), k, dtype=weights.dtype
    )
    f = jax.lax.stop_gradient(jnp.mean(hard, axis=0))
    p = jnp.mean(weights, axis=0)
    return k * jnp.sum(f * p)
