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


def test_moe_torch_checkpoint_import(rng):
    """`moe_model.pth` (the reference's trained selector + banks) must load
    into our MoE params and agree with the separately-shipped kernel/sigma
    .npy artifacts after the softmax/softplus mappings."""
    import jax
    import jax.numpy as jnp

    from kmsr_tpu.models.moe import (
        MoEConfig,
        effective_kernels,
        effective_sigmas,
        moe_forward,
    )
    from kmsr_tpu.utils import load_moe_torch_checkpoint

    params, state = load_moe_torch_checkpoint(f"{REF}/moe_model.pth")
    ks = np.asarray(effective_kernels(params))   # [10, 5, 13, 13]
    sg = np.asarray(effective_sigmas(params))    # [10, 5]
    for i in range(10):
        np.testing.assert_allclose(
            ks[i], np.load(f"{REF}/kernel_{i}.npy"), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            sg[i], np.load(f"{REF}/sigma_{i}.npy"), rtol=1e-4
        )

    # the imported selector must drive the full forward path
    x = jnp.asarray(rng.normal(3, 1, (4, 5, 64, 64)).astype(np.float32))
    out, w, _, _ = moe_forward(
        params, state, jax.random.PRNGKey(0), x,
        temp=0.5, hard=True, train=False, cfg=MoEConfig(),
    )
    assert out.shape == (4, 5, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0, rtol=1e-5)


def test_moe_train_warm_start(tmp_path):
    """--init-from accepts both the reference's .pth and our .npz."""
    import jax

    from kmsr_tpu.train.moe import (
        MoETrainConfig,
        init_moe_training,
        save_moe_artifacts,
    )

    cfg = MoETrainConfig(iters=1, outdir=str(tmp_path))
    st_pth = init_moe_training(cfg, init_from=f"{REF}/moe_model.pth")
    ks = np.asarray(st_pth.g_params["kernel_bank"])
    assert ks.shape == (10, 5, 13, 13)

    save_moe_artifacts(jax.device_get(st_pth.g_params), str(tmp_path))
    st_npz = init_moe_training(cfg, init_from=str(tmp_path / "moe_model.npz"))
    for a, b in zip(
        jax.tree_util.tree_leaves(st_pth.g_params),
        jax.tree_util.tree_leaves(st_npz.g_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
