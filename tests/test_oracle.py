"""Known-kernel deconvolution oracle (quality-report ceiling bound)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.analysis.oracle import known_kernel_deconv, oracle_sweep
from kmsr_tpu.ops.degrade import degrade


def _gauss_kernel(c, k, sigma=1.5):
    ax = np.arange(k) - k // 2
    g = np.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / (2 * sigma**2))
    g /= g.sum()
    return np.broadcast_to(g, (c, k, k)).astype(np.float32)


def test_oracle_exact_at_factor1_delta_kernel(rng):
    """factor 1 + delta kernel: A is the identity, so CG with tiny lam
    must return (numerically) the input."""
    x = rng.normal(5, 1, (2, 16, 16)).astype(np.float32)
    kernel = np.zeros((2, 5, 5), np.float32)
    kernel[:, 2, 2] = 1.0
    got = np.asarray(known_kernel_deconv(
        jnp.asarray(x), jnp.asarray(kernel), 1, x.shape, 1e-8, iters=30
    ))
    np.testing.assert_allclose(got, x, atol=1e-4)


def test_oracle_beats_zero_order_hold(rng):
    """On a noiseless blur+x4 downsample of a structured image, the
    known-kernel CG solve must reconstruct far better than upsampling —
    the property that makes it a ceiling bound."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64),
                         indexing="ij")
    hr = np.stack([
        5 + 2 * np.sin(9 * xx) * np.cos(7 * yy),
        8 + 3 * xx + np.sin(14 * yy),
    ]).astype(np.float32)
    kernel = _gauss_kernel(2, 5)
    lr = np.asarray(degrade(jnp.asarray(hr), jnp.asarray(kernel), factor=4))
    # lam must be large enough for the gradient prior to fill the x4
    # decimation's null space (the sweep's job in production); 1e-3 is
    # mid-grid. Measured: err 0.030 vs ZOH 0.194.
    pred = np.asarray(known_kernel_deconv(
        jnp.asarray(lr), jnp.asarray(kernel), 4, hr.shape, 1e-3, iters=150
    ))
    zoh = np.repeat(np.repeat(lr, 4, axis=-2), 4, axis=-1)
    err_oracle = np.sqrt(np.mean((pred - hr) ** 2))
    err_zoh = np.sqrt(np.mean((zoh - hr) ** 2))
    assert err_oracle < 0.3 * err_zoh, (err_oracle, err_zoh)


def test_oracle_consistent_with_forward(rng):
    """Re-degrading the reconstruction reproduces the observed LR (data
    fidelity — the solve honors the factory operator)."""
    hr = rng.normal(5, 1, (2, 32, 32)).astype(np.float32)
    kernel = _gauss_kernel(2, 5)
    lr = degrade(jnp.asarray(hr), jnp.asarray(kernel), factor=4)
    pred = known_kernel_deconv(
        jnp.asarray(lr), jnp.asarray(kernel), 4, hr.shape, 1e-6, iters=200
    )
    lr_again = degrade(pred, jnp.asarray(kernel), factor=4)
    rel = float(jnp.abs(lr_again - lr).max() / jnp.abs(lr).max())
    assert rel < 1e-2, rel


def test_matched_prior_weights(rng):
    """matched_prior: DC unpenalized, weights positive, noise scaling
    carried through both terms."""
    from kmsr_tpu.analysis.oracle import matched_prior

    hr = rng.normal(5, 1, (6, 2, 16, 16)).astype(np.float32)
    nvar = np.array([0.5, 2.0])
    w, inv_n = matched_prior(hr, nvar)
    assert w.shape == (2, 16, 16) and inv_n.shape == (2,)
    assert w[0, 0, 0] == 0.0 and w[1, 0, 0] == 0.0
    assert (w >= 0).all() and np.isfinite(w).all()
    np.testing.assert_allclose(inv_n, [2.0, 0.5])
    # doubling the noise variance doubles the prior weight (sigma^2/S)
    w2, _ = matched_prior(hr, 2 * nvar)
    np.testing.assert_allclose(w2, 2 * w, rtol=1e-5)


def test_oracle_sweep_matched_prior_runs(rng):
    """matched sweep on noisy blur+x4: finite preds, interior bookkeeping
    identical to the grad sweep's contract."""
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32),
                         indexing="ij")
    hr = np.stack([5 + np.sin(8 * xx) * np.cos(6 * yy)
                   for _ in range(2)]).astype(np.float32)
    hr = hr[None].repeat(4, axis=0)
    kernel = _gauss_kernel(2, 5)
    lr = np.stack([
        np.asarray(degrade(jnp.asarray(h), jnp.asarray(kernel), factor=4))
        + rng.normal(0, 0.05, (2, 8, 8)).astype(np.float32)
        for h in hr
    ])
    best, preds, per_lam = oracle_sweep(
        lr[2:], hr[2:], kernel, 4, lams=(0.3, 3.0), iters=40,
        prior="matched", noise_var=np.array([0.0025, 0.0025]),
        spec_examples=hr[:2],
    )
    assert best in (0.3, 3.0)
    assert preds.shape == hr[2:].shape
    assert np.isfinite(preds).all()
    assert per_lam[best] == max(per_lam.values())


def test_oracle_sweep_picks_best_lam(rng):
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32),
                         indexing="ij")
    hr = np.stack([5 + np.sin(8 * xx) * np.cos(6 * yy)
                   for _ in range(2)]).astype(np.float32)
    hr = hr[None].repeat(2, axis=0)  # [N=2, C=2, 32, 32]
    kernel = _gauss_kernel(2, 5)
    lr = np.stack([
        np.asarray(degrade(jnp.asarray(h), jnp.asarray(kernel), factor=4))
        + rng.normal(0, 0.02, (2, 8, 8)).astype(np.float32)
        for h in hr
    ])
    best, preds, per_lam = oracle_sweep(
        lr, hr, kernel, 4, lams=(1e-4, 1e-2), iters=60
    )
    assert best in (1e-4, 1e-2)
    assert per_lam[best] == max(per_lam.values())
    assert preds.shape == hr.shape
    assert np.isfinite(preds).all()
