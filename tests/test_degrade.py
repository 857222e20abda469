"""Degrade-op parity vs torch semantics (replicate pad + depthwise conv +
stacked avg-pools), matching the reference degrader's math."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from kmsr_tpu.ops import (
    block_mean,
    degrade,
    degrade_batch_kernels,
    degrade_strided,
    normalize_kernel,
)


def torch_degrade(img: np.ndarray, kernel: np.ndarray, factor: int = 8) -> np.ndarray:
    """Ground-truth semantics: replicate pad -> grouped conv -> stacked
    2x2 avg pools (independent torch formulation, used only as an oracle)."""
    img_t = torch.from_numpy(img)[None]  # [1,C,H,W]
    C = img.shape[0]
    k = torch.from_numpy(kernel)
    if k.ndim == 2:
        k = k[None].repeat(C, 1, 1)
    k = k / k.sum(dim=(-2, -1), keepdim=True)
    kh, kw = k.shape[-2:]
    x = F.pad(img_t, (kw // 2, kw // 2, kh // 2, kh // 2), mode="replicate")
    y = F.conv2d(x, k[:, None], groups=C)
    for _ in range(int(np.log2(factor))):
        y = F.avg_pool2d(y, 2, 2)
    return y[0].numpy()


@pytest.fixture
def img(rng):
    return rng.normal(5.0, 2.0, size=(5, 64, 64)).astype(np.float32)


@pytest.fixture
def kernel13(rng):
    k = rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32)
    return k


def test_degrade_matches_torch(img, kernel13):
    want = torch_degrade(img, kernel13)
    got = np.asarray(degrade(jnp.asarray(img), jnp.asarray(kernel13)))
    assert got.shape == (5, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_degrade_2d_kernel_broadcast(img, rng):
    k = rng.uniform(0, 1, size=(13, 13)).astype(np.float32)
    want = torch_degrade(img, k)
    got = np.asarray(degrade(jnp.asarray(img), jnp.asarray(k)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_degrade_strided_equals_unfused(img, kernel13):
    a = np.asarray(degrade(jnp.asarray(img), jnp.asarray(kernel13)))
    b = np.asarray(degrade_strided(jnp.asarray(img), jnp.asarray(kernel13)))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_degrade_batched(rng, kernel13):
    imgs = rng.normal(size=(3, 5, 32, 32)).astype(np.float32)
    out = np.asarray(degrade(jnp.asarray(imgs), jnp.asarray(kernel13)))
    assert out.shape == (3, 5, 4, 4)
    for i in range(3):
        np.testing.assert_allclose(
            out[i], torch_degrade(imgs[i], kernel13), rtol=1e-4, atol=1e-4
        )


def test_normalize_kernel():
    k = jnp.ones((5, 3, 3))
    n = normalize_kernel(k)
    np.testing.assert_allclose(np.asarray(n.sum(axis=(-2, -1))), 1.0, rtol=1e-6)


def test_block_mean_equals_stacked_avgpool(rng):
    x = rng.normal(size=(2, 5, 32, 32)).astype(np.float32)
    got = np.asarray(block_mean(jnp.asarray(x), 8))
    t = torch.from_numpy(x)
    for _ in range(3):
        t = F.avg_pool2d(t, 2, 2)
    np.testing.assert_allclose(got, t.numpy(), rtol=1e-5, atol=1e-6)


def test_degrade_batch_kernels_matches_torch_groups_trick(rng):
    """Per-sample kernels via batch-as-groups conv (MoE semantics:
    SAME zero pad + ::4 decimation)."""
    B, C, H = 4, 5, 32
    x = rng.normal(size=(B, C, H, H)).astype(np.float32)
    ks = rng.uniform(0, 1, size=(B, C, 13, 13)).astype(np.float32)

    xt = torch.from_numpy(x).reshape(1, B * C, H, H)
    kt = torch.from_numpy(ks).reshape(B * C, 1, 13, 13)
    want = F.conv2d(xt, kt, padding=6, groups=B * C).reshape(B, C, H, H)
    want = want[:, :, ::4, ::4].numpy()

    got = np.asarray(
        degrade_batch_kernels(jnp.asarray(x), jnp.asarray(ks), factor=4, decimate=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ops_package_imports_lazily():
    """`import kmsr_tpu.ops` must not drag in jax.experimental.pallas —
    XLA-only consumers (pipeline CLIs on CPU hosts) shouldn't pay the
    Mosaic import; Pallas-backed ops load on first attribute access."""
    import subprocess
    import sys

    code = (
        "import sys, os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import kmsr_tpu.ops\n"
        "assert 'jax.experimental.pallas' not in sys.modules\n"
        "from kmsr_tpu.ops import degrade_pallas_presplit\n"
        "assert 'jax.experimental.pallas' in sys.modules\n"
        "print('ok')\n"
    )
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert r.stdout.strip().endswith("ok")


def test_batch_kernels_chunked_matches_direct(rng):
    """The im2col-footprint chunking in degrade_batch_kernels (lax.map
    over batch chunks) must be bit-equal to the direct einsum for every
    padding/decimate mode, including prime batch sizes and a cap below
    one sample (regression: the factory's 128-file MoE batches at 256^2
    tried to materialize a 28 GB [B, C*K*K, H, W] intermediate on a
    16 GB chip)."""
    import importlib

    D = importlib.import_module("kmsr_tpu.ops.degrade")
    img = jnp.asarray(rng.normal(5, 1, (12, 2, 32, 32)).astype(np.float32))
    ks = jnp.asarray(rng.uniform(0, 1, (12, 2, 5, 5)).astype(np.float32))
    cap0 = D._BATCH_KERNELS_IM2COL_CAP
    try:
        for pad in ("same", "replicate"):
            for dec in (False, True):
                D._BATCH_KERNELS_IM2COL_CAP = cap0
                want = D.degrade_batch_kernels(
                    img, ks, factor=4, decimate=dec, padding=pad)
                D._BATCH_KERNELS_IM2COL_CAP = 900_000  # forces 4-row chunks
                got = D.degrade_batch_kernels(
                    img, ks, factor=4, decimate=dec, padding=pad)
                np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # prime batch: largest divisor under the cap is 1
        D._BATCH_KERNELS_IM2COL_CAP = 900_000
        got11 = D.degrade_batch_kernels(img[:11], ks[:11], factor=4)
        # cap below a single sample must not recurse forever
        D._BATCH_KERNELS_IM2COL_CAP = 100
        tiny = D.degrade_batch_kernels(img[:1], ks[:1], factor=4)
        assert tiny.shape == (1, 2, 8, 8)
        D._BATCH_KERNELS_IM2COL_CAP = cap0
        want11 = D.degrade_batch_kernels(img[:11], ks[:11], factor=4)
        np.testing.assert_array_equal(np.asarray(got11), np.asarray(want11))
    finally:
        D._BATCH_KERNELS_IM2COL_CAP = cap0
