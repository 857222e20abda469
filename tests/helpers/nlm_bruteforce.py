"""Definition-level brute-force NLM oracle for parity tests.

The production paths (`kmsr_tpu.ops.nlm.nlm_denoise_2d` and its numpy
twin `nlm_denoise_np`) both use the dense shift-lattice + box-filter
formulation; a bug in that shared structure (window alignment, box-sum
off-by-one) could hide in a two-way comparison. This oracle is the naive
per-pixel transliteration of the NLM definition with explicit patch
extraction — no integral images, no shift lattice — matching the
reference's skimage fast-mode semantics (`/root/reference/denoise/
denoise.py:55-63`): uniform patch weighting over patch_size^2 pixels,
weight w = exp(-max(mean_sq_diff - 2*sigma^2, 0) / h^2), patch windows
over an offset-wide reflect ring, candidate centers restricted to
in-image pixels (skimage clamps its shift loops at borders), and the
null shift double-counted (self-weight 2, from skimage's symmetric-pair
accumulation).

O(N * S^2 * P^2): keep test images tiny.
"""
from __future__ import annotations

import numpy as np


def nlm_bruteforce(
    img: np.ndarray,
    h: float,
    sigma: float = 0.0,
    patch_size: int = 3,
    patch_distance: int = 3,
) -> np.ndarray:
    img = np.asarray(img, np.float64)
    hgt, wid = img.shape
    o = patch_size // 2
    pad = patch_distance + o
    up = np.pad(img, pad, mode="reflect")
    var2 = 2.0 * sigma * sigma
    h2 = h * h if h > 0 else 1e-12
    out = np.empty((hgt, wid))
    for i in range(hgt):
        for j in range(wid):
            pi, pj = i + pad, j + pad
            ref = up[pi - o : pi + o + 1, pj - o : pj + o + 1]
            # extra null-shift contribution: skimage's symmetric pair
            # accumulation counts the center twice (weight exp(0) = 1)
            num = float(up[pi, pj])
            den = 1.0
            for t1 in range(-patch_distance, patch_distance + 1):
                for t2 in range(-patch_distance, patch_distance + 1):
                    if not (0 <= i + t1 < hgt and 0 <= j + t2 < wid):
                        continue  # candidate center outside the image
                    cand = up[
                        pi + t1 - o : pi + t1 + o + 1,
                        pj + t2 - o : pj + t2 + o + 1,
                    ]
                    d2 = float(np.mean((ref - cand) ** 2))
                    w = np.exp(-max(d2 - var2, 0.0) / h2)
                    num += w * up[pi + t1, pj + t2]
                    den += w
            out[i, j] = num / den
    return out
