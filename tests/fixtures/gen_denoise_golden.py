"""Generate skimage golden fixtures for the denoise parity tests.

Run this in ANY environment where scikit-image is installed (it is NOT
available in the CI image — see tests/test_denoise.py, which skips the
fixture-backed tests when the .npz files are absent):

    python tests/fixtures/gen_denoise_golden.py

It records, for a set of deterministic seeded inputs, the outputs of the
exact calls the reference makes (`/root/reference/denoise/denoise.py:47,
55-63`):

    estimate_sigma(img)
    denoise_nl_means(img, h=1.8*sigma, sigma=sigma, fast_mode=True,
                     patch_size=7, patch_distance=11)

into tests/fixtures/denoise_golden/*.npz. Commit the .npz files; the
parity tests then assert the JAX path against true skimage outputs
instead of a same-author numpy re-derivation.
"""
from __future__ import annotations

import os

import numpy as np

CASES = [
    # (name, shape, kind)
    ("noise64", (64, 64), "white"),
    ("struct96", (96, 96), "structured"),
    ("radiance80", (80, 80), "radiance"),
]


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
    from skimage.restoration import denoise_nl_means, estimate_sigma

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "denoise_golden")
    os.makedirs(out_dir, exist_ok=True)
    for name, shape, kind in CASES:
        img = make_input(name, shape, kind)
        sigma = float(estimate_sigma(img, average_sigmas=True))
        h = 1.8 * sigma
        den = denoise_nl_means(
            img,
            h=h,
            sigma=sigma,
            fast_mode=True,
            patch_size=7,
            patch_distance=11,
        ).astype(np.float64)
        path = os.path.join(out_dir, f"{name}.npz")
        np.savez_compressed(
            path,
            img=img,
            sigma=np.float64(sigma),
            h=np.float64(h),
            denoised=den,
            patch_size=7,
            patch_distance=11,
        )
        print(f"wrote {path}: sigma={sigma:.6f}")


if __name__ == "__main__":
    main()
