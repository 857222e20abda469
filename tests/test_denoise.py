"""Sigma estimation + NLM denoise tests.

Three independent oracles guard the device path:
- `nlm_denoise_np` (dense shift-lattice numpy twin),
- `tests/helpers/nlm_bruteforce.py` (definition-level per-pixel loops,
  structurally unrelated to the box-filter formulation),
- recorded skimage goldens in `tests/fixtures/denoise_golden/` (generated
  by `tests/fixtures/gen_denoise_golden.py` in a skimage-equipped
  environment; the CI image has no skimage, so those tests skip if the
  fixtures are absent).
"""
import glob
import os

import numpy as np
import pytest

from kmsr_tpu.ops.nlm import (
    denoise_band,
    denoise_stack,
    nlm_denoise_2d,
    nlm_denoise_np,
)
from kmsr_tpu.ops.sigma import _DB2_HI, _DB2_LO, estimate_sigma, estimate_sigma_np
from tests.helpers.nlm_bruteforce import nlm_bruteforce

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "denoise_golden")
_GOLDEN_FILES = sorted(glob.glob(os.path.join(_GOLDEN_DIR, "*.npz")))


def test_sigma_estimates_white_noise(rng):
    sigma_true = 0.37
    img = rng.normal(0, sigma_true, size=(128, 128)).astype(np.float32)
    est_np = estimate_sigma_np(img)
    est_jax = float(estimate_sigma(img))
    assert est_np == pytest.approx(sigma_true, rel=0.08)
    assert est_jax == pytest.approx(est_np, rel=1e-3)


def test_sigma_near_zero_on_smooth_image():
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 64))
    img = np.sin(3 * xx) + yy**2
    assert estimate_sigma_np(img) < 5e-3
    assert float(estimate_sigma(img.astype(np.float32))) < 5e-3


def test_sigma_on_noisy_structured_image(rng):
    yy, xx = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 128))
    clean = 5 * np.sin(4 * xx) * np.cos(3 * yy)
    noisy = clean + rng.normal(0, 0.2, clean.shape)
    est = estimate_sigma_np(noisy.astype(np.float32))
    assert est == pytest.approx(0.2, rel=0.25)


def test_db2_filters_match_closed_form():
    """The D4 (db2) decomposition filters are published constants:
    scaling h_k = [(1+√3), (3+√3), (3−√3), (1−√3)] / (4√2), stored in
    pywt's dec_lo order (reversed) with the QMF high-pass
    g_k = (−1)^(k+1) h_k — the exact filters skimage's estimate_sigma
    uses via pywt. Guards against a transcription error in sigma.py."""
    s3, s2 = np.sqrt(3.0), 4.0 * np.sqrt(2.0)
    h = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / s2
    dec_lo = h[::-1]
    dec_hi = np.array([-h[0], h[1], -h[2], h[3]])
    np.testing.assert_allclose(_DB2_LO, dec_lo, atol=1e-12)
    np.testing.assert_allclose(_DB2_HI, dec_hi, atol=1e-12)
    # orthonormal QMF pair: unit energy, zero mean high-pass
    assert np.sum(dec_lo**2) == pytest.approx(1.0, abs=1e-12)
    assert np.sum(dec_hi) == pytest.approx(0.0, abs=1e-12)


def test_nlm_matches_bruteforce_definition(rng):
    """Both the numpy shift-lattice twin and the JAX path must agree with
    the naive per-pixel NLM definition — a structurally independent oracle
    that would expose a shared box-filter/window-alignment bug."""
    img = rng.normal(2.0, 0.5, size=(16, 16)).astype(np.float32)
    for ps, pd, h, sigma in [(3, 3, 0.4, 0.2), (5, 4, 0.6, 0.0)]:
        want = nlm_bruteforce(img, h, sigma, patch_size=ps, patch_distance=pd)
        got_np = nlm_denoise_np(img, h, sigma, patch_size=ps, patch_distance=pd)
        got_jax = np.asarray(
            nlm_denoise_2d(img, h, sigma, patch_size=ps, patch_distance=pd)
        )
        np.testing.assert_allclose(got_np, want, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(got_jax, want, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(
    not _GOLDEN_FILES,
    reason="skimage goldens absent (generate with tests/fixtures/gen_denoise_golden.py)",
)
@pytest.mark.parametrize(
    "path", _GOLDEN_FILES, ids=[os.path.basename(p) for p in _GOLDEN_FILES]
)
def test_against_skimage_golden(path):
    """JAX sigma + NLM vs recorded skimage outputs (the reference's exact
    calls, `/root/reference/denoise/denoise.py:47,55-63`)."""
    z = np.load(path)
    img = z["img"]
    sig_jax = float(estimate_sigma(img))
    assert sig_jax == pytest.approx(float(z["sigma"]), rel=1e-3)
    den = np.asarray(
        nlm_denoise_2d(
            img,
            float(z["h"]),
            float(z["sigma"]),
            patch_size=int(z["patch_size"]),
            patch_distance=int(z["patch_distance"]),
        )
    )
    rmse = float(np.sqrt(np.mean((den - z["denoised"]) ** 2)))
    scale = float(np.std(img)) or 1.0
    assert rmse / scale < 1e-3, f"RMSE vs skimage golden {rmse} (scale {scale})"


@pytest.mark.slow
def test_nlm_jax_matches_numpy(rng):
    img = rng.normal(2.0, 0.5, size=(24, 24)).astype(np.float32)
    h, sigma = 0.3, 0.2
    want = nlm_denoise_np(img, h, sigma, patch_size=3, patch_distance=4)
    got = np.asarray(nlm_denoise_2d(img, h, sigma, patch_size=3, patch_distance=4))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nlm_reduces_noise(rng):
    yy, xx = np.meshgrid(np.linspace(0, 1, 48), np.linspace(0, 1, 48))
    clean = (5 * np.sin(6 * xx) * np.cos(4 * yy)).astype(np.float32)
    noisy = clean + rng.normal(0, 0.3, clean.shape).astype(np.float32)
    den = np.asarray(
        nlm_denoise_2d(noisy, h=0.3 * 1.5, sigma=0.3, patch_size=5, patch_distance=6)
    )
    err_before = np.sqrt(np.mean((noisy - clean) ** 2))
    err_after = np.sqrt(np.mean((den - clean) ** 2))
    assert err_after < 0.6 * err_before


@pytest.mark.slow
def test_denoise_band_nan_contract(rng):
    band = rng.normal(3.0, 0.2, size=(40, 40)).astype(np.float32)
    band[:5, :5] = np.nan
    den, sigma = denoise_band(band, h_factor=1.8)
    assert np.isnan(den[:5, :5]).all()
    assert np.isfinite(den[5:, 5:]).all()
    assert sigma > 0


def test_denoise_band_all_nan():
    band = np.full((16, 16), np.nan, np.float32)
    den, sigma = denoise_band(band)
    assert np.isnan(den).all() and sigma == 0.0


@pytest.mark.slow
def test_denoise_stack_shapes(rng):
    stack = rng.normal(3.0, 0.2, size=(5, 32, 32)).astype(np.float32)
    den, sigmas = denoise_stack(stack)
    assert den.shape == stack.shape
    assert len(sigmas) == 5


@pytest.mark.slow
def test_denoise_batch_matches_per_stack(rng):
    """The multi-file device sweep must agree with per-stack denoising."""
    from kmsr_tpu.ops.nlm import denoise_batch

    stacks = rng.normal(3.0, 0.2, size=(3, 2, 24, 24)).astype(np.float32)
    stacks[1, 0, :4, :4] = np.nan
    den_b, sig_b = denoise_batch(stacks, h_factor=1.5)
    assert den_b.shape == stacks.shape and sig_b.shape == (3, 2)
    for i in range(3):
        den_s, sig_s = denoise_stack(stacks[i], h_factor=1.5)
        np.testing.assert_allclose(den_b[i], den_s, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(sig_b[i], sig_s, rtol=1e-5)
    # NaN holes restored
    assert np.isnan(den_b[1, 0, :4, :4]).all()


@pytest.mark.slow
def test_denoise_pipeline_stage(tmp_path, rng):
    from kmsr_tpu.io import GROUP_DENOISED, GROUP_GEO, NCFile, read_band_stack, write_band_stack
    from kmsr_tpu.pipeline.denoise_cli import main as denoise_main

    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    for name in ["p1", "p2"]:
        stack = rng.normal(3.0, 0.3, size=(5, 32, 32)).astype(np.float32)
        write_band_stack(src / f"{name}.nc", GROUP_GEO, stack, mode="w")
    rc = denoise_main(["--batch", str(src), "--output", str(out)])
    assert rc == 0
    files = sorted(out.glob("*_denoised.nc"))
    assert len(files) == 2
    den = read_band_stack(files[0], GROUP_DENOISED)
    assert den.shape == (5, 32, 32)
    with NCFile(files[0], "r") as f:
        attrs = f.get_attrs(group=GROUP_DENOISED)
    assert attrs["h_factor"] == pytest.approx(1.8)
    assert attrs["patch_size"] == 7 and attrs["patch_distance"] == 11
    assert attrs["average_sigma"] > 0
    assert "L_TOA_443_sigma" in attrs
    # original group preserved
    assert read_band_stack(files[0], GROUP_GEO).shape == (5, 32, 32)
