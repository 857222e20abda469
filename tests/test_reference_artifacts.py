"""Compatibility with the reference's shipped kernel artifacts.

The reference repo ships trained artifacts (`moe_kernels/kernel_*.npy`,
`sigma_*.npy`); our pipeline must consume them directly (BASELINE configs:
"Multi-kernel MoE degradation sweep over moe_kernels/kernel_{0..9}.npy").
These tests run only when the reference checkout is present.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/moe_kernels"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference artifacts not mounted"
)


def test_reference_moe_artifacts_load():
    kernels = [np.load(f"{REF}/kernel_{i}.npy") for i in range(10)]
    sigmas = [np.load(f"{REF}/sigma_{i}.npy") for i in range(10)]
    for k in kernels:
        assert k.shape == (5, 13, 13)
        np.testing.assert_allclose(k.sum(axis=(1, 2)), 1.0, rtol=1e-4)
    for s in sigmas:
        assert s.shape == (5,) and (s > 0).all()


def test_apply_kernel_consumes_reference_artifacts(tmp_path, rng):
    """Our apply-kernel stage degrades with the reference's own kernels."""
    import jax.numpy as jnp

    from kmsr_tpu.io import GROUP_BLURRED, GROUP_DENOISED, read_band_stack, write_band_stack
    from kmsr_tpu.pipeline.apply_kernel import load_kernel, main as apply_main

    k = load_kernel(f"{REF}/kernel_0.npy")
    assert k.shape == (5, 13, 13)

    patches = tmp_path / "p"
    patches.mkdir()
    stack = rng.normal(3, 1, (5, 64, 64)).astype(np.float32)
    write_band_stack(patches / "a.nc", GROUP_DENOISED, stack, mode="w")
    out = tmp_path / "out"
    rc = apply_main(
        [
            "--input-dir", str(patches),
            "--kernel", f"{REF}/kernel_0.npy",
            "--output-dir", str(out),
        ]
    )
    assert rc == 0
    b = read_band_stack(next(out.glob("*_blurred.nc")), GROUP_BLURRED)
    assert b.shape == (5, 8, 8)
    assert np.isfinite(b).all()


def test_moe_sampler_with_reference_bank(rng):
    """vmapped multi-kernel degradation sweep over the reference bank."""
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.ops import degrade

    bank = jnp.asarray(
        np.stack([np.load(f"{REF}/kernel_{i}.npy") for i in range(10)])
    )  # [10, 5, 13, 13]
    img = jnp.asarray(rng.normal(3, 1, (2, 5, 64, 64)).astype(np.float32))
    sweep = jax.vmap(lambda k: degrade(img, k, factor=8))(bank)
    assert sweep.shape == (10, 2, 5, 8, 8)
    # different kernels must produce different degradations
    flat = np.asarray(sweep).reshape(10, -1)
    assert np.std(flat, axis=0).mean() > 0
