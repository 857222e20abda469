"""Generate the denoise-parity golden fixtures.

The reference denoises with scikit-image (`/root/reference/denoise/
denoise.py:47,55-63`):

    sigma = estimate_sigma(img)
    out = denoise_nl_means(img, h=h_factor*sigma, sigma=sigma,
                           fast_mode=True, patch_size=7, patch_distance=11)

scikit-image / PyWavelets are NOT installable in this image, so the
fixtures are produced by `tests/helpers/skimage_twin.py` — a faithful
re-derivation of both code paths written against the published
algorithms (Buades 2005 NLM; Darbon 2008 integral-image fast mode;
Donoho-Johnstone wavelet sigma via pywt's documented dwt convention;
Schraudolph 1999 fast_exp as shipped in skimage/_shared/fast_exp.h) —
see that module's docstring for the full derivation and the two
documented divergences. When scikit-image IS importable (e.g. re-running
this script in a richer environment), the real library output is
recorded instead and `source` says so.

Each .npz records TWO denoised goldens:
  denoised_exact    — the published algorithm with the true exp weight
                      function and no distance cutoff. The production
                      path implements exactly these semantics; the test
                      asserts RMSE/scale < 1e-3 against this (measured
                      ~5e-6 — the margin is structural, not tuned).
  denoised_skimage  — skimage's bit-level behavior: Schraudolph fast_exp
                      (sawtooth ~1.8% rms weight error) + the
                      DISTANCE_CUTOFF=5.0 skip. Measured to move the
                      output by 0.8-1.7e-3 of image scale on these
                      cases; the test asserts < 3e-3 against this,
                      bounding total deviation from the real library
                      including its internal approximation.

Run: python tests/fixtures/gen_denoise_golden.py  (commit the .npz files)
"""
from __future__ import annotations

import os
import sys

import numpy as np

CASES = [
    # (name, shape, kind)
    ("noise64", (64, 64), "white"),
    ("struct96", (96, 96), "structured"),
    ("radiance80", (80, 80), "radiance"),
]

H_FACTOR = 1.8  # the GOCI-2 default (README.MD:17, denoise.py:270-271)


def make_input(name: str, shape, kind: str) -> np.ndarray:
    rng = np.random.default_rng({"noise64": 1, "struct96": 2, "radiance80": 3}[name])
    if kind == "white":
        return rng.normal(5.0, 0.4, shape).astype(np.float32)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, shape[0]), np.linspace(0, 1, shape[1]), indexing="ij"
    )
    if kind == "structured":
        clean = 5 + 2 * np.sin(6 * xx) * np.cos(4 * yy)
        return (clean + rng.normal(0, 0.3, shape)).astype(np.float32)
    # radiance-like: smooth gradient + speckle, positive values
    clean = 8 + 3 * xx + 2 * yy * yy
    return (clean + rng.normal(0, 0.5, shape)).astype(np.float32)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    from tests.helpers.skimage_twin import estimate_sigma_twin, fast_nl_means_2d

    try:
        from skimage.restoration import denoise_nl_means, estimate_sigma

        have_skimage = True
    except ImportError:
        have_skimage = False

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "denoise_golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, shape, kind in CASES:
        img = make_input(name, shape, kind)
        sigma_twin = estimate_sigma_twin(img)
        if have_skimage:
            sigma = float(estimate_sigma(img, average_sigmas=True))
            h = H_FACTOR * sigma
            den_skimage = denoise_nl_means(
                img, h=h, sigma=sigma, fast_mode=True,
                patch_size=7, patch_distance=11,
            ).astype(np.float64)
            source = "skimage"
            print(f"{name}: sigma skimage={sigma:.6f} twin={sigma_twin:.6f} "
                  f"(rel {abs(sigma_twin / sigma - 1):.2e})")
        else:
            sigma = sigma_twin
            h = H_FACTOR * sigma
            den_skimage = fast_nl_means_2d(img, 7, 11, h, sigma)
            source = "twin"
        den_exact = fast_nl_means_2d(
            img, 7, 11, h, sigma, exact_exp=True, cutoff=np.inf
        )
        scale = float(np.std(img))
        fastexp_effect = float(
            np.sqrt(np.mean((den_skimage - den_exact) ** 2)) / scale
        )
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(
            path,
            img=img,
            sigma=np.float64(sigma),
            h=np.float64(h),
            denoised_exact=den_exact,
            denoised_skimage=den_skimage,
            fastexp_effect=np.float64(fastexp_effect),
            source=source,
            patch_size=7,
            patch_distance=11,
        )
        print(f"wrote {path}: sigma={sigma:.6f} source={source} "
              f"fastexp_effect={fastexp_effect:.2e} of scale")


if __name__ == "__main__":
    main()
