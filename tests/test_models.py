"""Generator / discriminator / kernel-algebra / loss tests.

Formalizes the reference's __main__ self-checks (shape + kernel-sum smoke
tests, delta-kernel regularizer sanity) as pytest, plus closed-form
composition parity against a torch oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from kmsr_tpu.losses import (
    kernel_regularization,
    lsgan_d_loss,
    lsgan_g_loss,
    noise_reg_loss,
    per_band_kernel_regularization,
)
from kmsr_tpu.models import (
    DiscriminatorConfig,
    GeneratorConfig,
    discriminator_forward,
    extract_kernels,
    extract_merged_kernel,
    gaussian_kernel,
    generator_forward,
    init_discriminator,
    init_generator,
)
from kmsr_tpu.ops import compose_chain, full_conv2d


# ---------------------------------------------------------------- kernel algebra
def torch_full_conv(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    at = torch.from_numpy(a)[None, None]
    bt = torch.flip(torch.from_numpy(b), dims=[0, 1])[None, None]
    pad = (b.shape[-2] - 1, b.shape[-1] - 1)
    return F.conv2d(at, bt, padding=pad)[0, 0].numpy()


def test_full_conv_matches_torch(rng):
    a = rng.normal(size=(7, 7)).astype(np.float32)
    b = rng.normal(size=(5, 5)).astype(np.float32)
    got = np.asarray(full_conv2d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, torch_full_conv(a, b), rtol=1e-4, atol=1e-5)
    # commutativity
    got2 = np.asarray(full_conv2d(jnp.asarray(b), jnp.asarray(a)))
    np.testing.assert_allclose(got, got2, rtol=1e-4, atol=1e-5)


def test_compose_chain_multichannel_matches_torch(rng):
    """Channel-contracted composition vs an explicit torch loop oracle."""
    w1 = rng.normal(size=(4, 1, 7, 7)).astype(np.float32)
    w2 = rng.normal(size=(4, 4, 5, 5)).astype(np.float32)
    w3 = rng.normal(size=(1, 4, 3, 3)).astype(np.float32)

    def oracle_pair(W, K):
        C_out, C_mid = W.shape[:2]
        C_in = K.shape[1]
        size = K.shape[-1] + W.shape[-1] - 1
        out = np.zeros((C_out, C_in, size, size), np.float32)
        for co in range(C_out):
            for ci in range(C_in):
                for cm in range(C_mid):
                    out[co, ci] += torch_full_conv(W[co, cm], K[cm, ci])
        return out

    want = oracle_pair(w3, oracle_pair(w2, w1))
    got = np.asarray(compose_chain([jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(w3)]))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_compose_chain_equals_applying_convs(rng):
    """Effective kernel must reproduce the chained conv's output."""
    ws = [
        rng.normal(size=(3, 1, 5, 5)).astype(np.float32) * 0.3,
        rng.normal(size=(1, 3, 3, 3)).astype(np.float32) * 0.3,
    ]
    x = rng.normal(size=(1, 1, 16, 16)).astype(np.float32)
    xt = torch.from_numpy(x)
    h = F.conv2d(xt, torch.from_numpy(ws[0]), padding=2)
    h = F.conv2d(h, torch.from_numpy(ws[1]), padding=1).numpy()
    k_eff = np.asarray(compose_chain([jnp.asarray(w) for w in ws]))  # [1,1,7,7]
    y = F.conv2d(xt, torch.from_numpy(k_eff), padding=3).numpy()
    np.testing.assert_allclose(h[..., 3:-3, 3:-3], y[..., 3:-3, 3:-3], rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- generator
def test_fresh_generator_kernel_is_gaussian():
    cfg = GeneratorConfig()
    params = init_generator(cfg)
    ks = np.asarray(extract_kernels(params))  # [5,13,13]
    assert ks.shape == (5, 13, 13)
    g7 = np.asarray(gaussian_kernel(7, 2.0))
    want = np.zeros((13, 13), np.float32)
    want[3:10, 3:10] = g7
    for c in range(5):
        np.testing.assert_allclose(ks[c], want, atol=1e-5)
    np.testing.assert_allclose(ks.sum(axis=(-2, -1)), 1.0, rtol=1e-5)


def test_extract_kernels_raw_differentiable_sum():
    """The raw extractor (no clamp/normalize) sums to ~1 at init and has
    a nonzero gradient through d(sum)/d(weights) — the property
    raw_sum_reg relies on to stop all-negative band collapse (the
    clamped path's gradient dies at negative entries)."""
    from kmsr_tpu.models.generator import extract_kernels_raw

    params = init_generator(GeneratorConfig())
    raw = np.asarray(extract_kernels_raw(params))
    assert raw.shape == (5, 13, 13)
    np.testing.assert_allclose(raw.sum(axis=(-2, -1)), 1.0, rtol=1e-5)

    def loss(p):
        s = jnp.sum(extract_kernels_raw(p), axis=(1, 2))
        return jnp.mean((s - 1.0) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(w).sum()) for w in g["layers"])
    assert np.isfinite(gnorm)
    # at the exact minimum the gradient is ~0; perturb and check signal
    params2 = {"layers": [w - 0.01 for w in params["layers"]]}
    g2 = jax.grad(loss)(params2)
    assert sum(float(jnp.abs(w).sum()) for w in g2["layers"]) > 1e-3


def test_generator_forward_shapes_and_gaussian_equivalence(rng):
    cfg = GeneratorConfig()
    params = init_generator(cfg)
    x = rng.normal(size=(2, 5, 64, 64)).astype(np.float32)
    y = np.asarray(generator_forward(params, jnp.asarray(x)))
    assert y.shape == (2, 5, 8, 8)
    merged = np.asarray(extract_merged_kernel(params))
    assert merged.shape == (13, 13)
    np.testing.assert_allclose(merged.sum(), 1.0, rtol=1e-5)


def test_generator_forward_matches_effective_kernel_blur(rng):
    """For the fresh (pure-Gaussian) generator, the forward pass must equal
    blurring with the extracted kernel away from the borders."""
    from kmsr_tpu.ops import block_mean

    params = init_generator(GeneratorConfig())
    x = rng.normal(size=(1, 5, 64, 64)).astype(np.float32)
    y = np.asarray(generator_forward(params, jnp.asarray(x)))
    ks = extract_kernels(params)
    xt = torch.from_numpy(x)
    kt = torch.from_numpy(np.asarray(ks))[:, None]
    blurred = F.conv2d(F.pad(xt, (6, 6, 6, 6), mode="reflect"), kt, groups=5)
    want = np.asarray(block_mean(jnp.asarray(blurred.numpy()), 8))
    np.testing.assert_allclose(y[0, :, 1:-1, 1:-1], want[0, :, 1:-1, 1:-1], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_generator_grad_flows():
    params = init_generator(GeneratorConfig())
    x = jnp.ones((1, 5, 32, 32))

    def loss(p):
        return jnp.mean(generator_forward(p, x) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(w))) for w in g["layers"])
    assert total > 0


@pytest.mark.slow
def test_extraction_stop_gradient_quirk():
    """Default extraction must NOT propagate gradients (reference parity)."""
    params = init_generator(GeneratorConfig())

    def reg_loss(p, differentiable):
        ks = extract_kernels(p, differentiable=differentiable)
        return per_band_kernel_regularization(ks)

    g0 = jax.grad(lambda p: reg_loss(p, False))(params)
    assert all(float(jnp.sum(jnp.abs(w))) == 0.0 for w in g0["layers"])
    g1 = jax.grad(lambda p: reg_loss(p, True))(params)
    assert sum(float(jnp.sum(jnp.abs(w))) for w in g1["layers"]) > 0


# ---------------------------------------------------------------- discriminator
def test_discriminator_shapes(rng):
    key = jax.random.PRNGKey(0)
    params, state = init_discriminator(key, DiscriminatorConfig())
    x = jnp.asarray(rng.normal(size=(4, 5, 32, 32)).astype(np.float32))
    y, new_state = discriminator_forward(params, state, x, train=True)
    assert y.shape == (4, 1, 32, 32)
    # power-iteration u vectors must update in train mode
    assert not np.allclose(np.asarray(new_state["u"][0]), np.asarray(state["u"][0]))
    y2, s2 = discriminator_forward(params, new_state, x, train=False)
    np.testing.assert_array_equal(np.asarray(s2["u"][0]), np.asarray(new_state["u"][0]))


def test_spectral_norm_power_iteration_converges(rng):
    """Power iteration on a weight with a dominant singular direction must
    converge to sigma_max, and the normalized weight must have sigma ~ 1."""
    from kmsr_tpu.models.discriminator import _spectral_normalize

    # Construct a [8, 45] weight with a dominant singular value.
    u_true = rng.normal(size=(8,)); u_true /= np.linalg.norm(u_true)
    v_true = rng.normal(size=(45,)); v_true /= np.linalg.norm(v_true)
    w_mat = 5.0 * np.outer(u_true, v_true) + 0.1 * rng.normal(size=(8, 45))
    w = jnp.asarray(w_mat.reshape(8, 5, 3, 3).astype(np.float32))
    u = jnp.asarray((rng.normal(size=(8,))).astype(np.float32))
    u = u / jnp.linalg.norm(u)
    for _ in range(50):
        w_sn, u = _spectral_normalize(w, u, update=True)
    sn_sigma = np.linalg.svd(np.asarray(w_sn).reshape(8, -1), compute_uv=False)[0]
    assert sn_sigma == pytest.approx(1.0, rel=1e-3)


# ---------------------------------------------------------------- losses
def test_lsgan_losses():
    r = jnp.ones((2, 1, 4, 4))
    f = jnp.zeros((2, 1, 4, 4))
    assert float(lsgan_d_loss(r, f)) == pytest.approx(0.0)
    assert float(lsgan_g_loss(f)) == pytest.approx(0.5)
    assert float(lsgan_d_loss(f, r)) == pytest.approx(1.0)


def test_kernel_reg_delta_kernel():
    """A centered delta kernel: sum-to-1, boundary and center terms vanish;
    sparse term contributes gamma*1 (+ centermax 0)."""
    k = jnp.zeros((13, 13)).at[6, 6].set(1.0)
    loss = float(kernel_regularization(k, alpha=0.5, beta=0.5, gamma=5.0, delta=1.0, epsilon=3.0))
    assert loss == pytest.approx(5.0, abs=1e-5)
    loss4 = float(kernel_regularization(k, center_max=False))
    assert loss4 == pytest.approx(5.0, abs=1e-5)


def test_kernel_reg_penalizes_offcenter():
    k_center = jnp.zeros((13, 13)).at[6, 6].set(1.0)
    k_off = jnp.zeros((13, 13)).at[0, 0].set(1.0)
    assert float(kernel_regularization(k_off)) > float(kernel_regularization(k_center))


def test_noise_reg():
    s = jnp.asarray([0.5, 0.7])
    t = jnp.asarray([0.5, 0.7])
    assert float(noise_reg_loss(s, t)) == pytest.approx(0.0)
    assert float(noise_reg_loss(s, 0.0)) == pytest.approx((0.25 + 0.49) / 2)
    assert float(noise_reg_loss(s, 0.0, mode="l1")) == pytest.approx(0.6)


def test_load_balance_loss_range_and_gradient():
    """Switch-style aux loss: 1 at uniform routing, K when collapsed; its
    gradient through the SOFT probabilities pushes mass OFF the expert
    the whole batch hard-routes to (the collapse-mitigation contract)."""
    from kmsr_tpu.losses import load_balance_loss

    uniform = jnp.full((8, 10), 0.1)
    assert float(load_balance_loss(uniform)) == pytest.approx(1.0)
    collapsed = jnp.zeros((8, 10)).at[:, 3].set(1.0)
    assert float(load_balance_loss(collapsed)) == pytest.approx(10.0)
    # near-collapsed soft weights: d(loss)/d(w[:, 3]) > 0 (penalized),
    # all other experts' soft mass has zero grad (their f_k = 0)
    w = jnp.full((8, 10), 0.02).at[:, 3].set(0.82)
    g = jax.grad(lambda x: load_balance_loss(x))(w)
    assert (np.asarray(g)[:, 3] > 0).all()
    other = np.asarray(g)[:, [c for c in range(10) if c != 3]]
    np.testing.assert_allclose(other, 0.0, atol=1e-7)


def test_compose_forward_matches_chain_interior(rng):
    """forward_mode="compose" (one depthwise conv with the composed kernel)
    must equal the chain everywhere except the 6px reflect-padding rim —
    compare on the interior of the downsampled output."""
    from kmsr_tpu.models.generator import GeneratorConfig, generator_forward, init_generator

    cfg = GeneratorConfig(mid_ch=8)
    params = init_generator(cfg)
    key = jax.random.PRNGKey(2)
    params = {
        "layers": [
            w + 0.05 * jax.random.normal(jax.random.fold_in(key, i), w.shape)
            for i, w in enumerate(params["layers"])
        ]
    }
    x = jnp.asarray(rng.normal(3, 1, (2, 5, 64, 64)).astype(np.float32))
    y_chain = np.asarray(generator_forward(params, x))
    y_comp = np.asarray(generator_forward(params, x, forward_mode="compose"))
    assert y_chain.shape == y_comp.shape == (2, 5, 8, 8)
    # 6px HR rim -> ceil(6/8) = 1 LR pixel rim differs; interior identical
    np.testing.assert_allclose(
        y_chain[:, :, 1:-1, 1:-1], y_comp[:, :, 1:-1, 1:-1], rtol=2e-5, atol=2e-5
    )
