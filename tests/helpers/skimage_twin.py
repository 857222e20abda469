"""Faithful reimplementation of the skimage code paths the reference calls.

The reference denoises every band with scikit-image
(`/root/reference/denoise/denoise.py:47` `estimate_sigma(img)`, `:55-63`
`denoise_nl_means(img, h=h_factor*sigma, sigma=sigma, fast_mode=True,
patch_size=7, patch_distance=11)`). scikit-image and PyWavelets are NOT
installable in this image, so the golden fixtures in
`tests/fixtures/denoise_golden/` are generated from THIS module — a
re-derivation of those two functions written against the published
algorithm and the documented library conventions, structurally
independent of the production code in `kmsr_tpu/ops/{sigma,nlm}.py`
(different padding/indexing formulation, its own filter derivation, its
own DWT convolution spelling). Derivation notes below; every modeled
implementation detail is cited to where it is published.

=== estimate_sigma ===

skimage.restoration.estimate_sigma (Donoho & Johnstone 1994, "Ideal
spatial adaptation by wavelet shrinkage", biomedical eq. for robust noise
estimation) is documented as: single-level 2-D DWT with wavelet 'db2'
(PyWavelets, default mode='symmetric'), take the diagonal detail subband
(`dwtn(...)['dd']`), drop exact zeros, and return
    sigma = median(|dd|) / scipy.stats.norm.ppf(0.75).

PyWavelets' dwt convention (pywt docs "Signal extension modes" +
`downsampling_convolution` in convolution.c): output length
floor((N + F - 1)/2) where F = dec filter length; sample o of the output
is the convolution of the symmetrically extended signal with the
decomposition filter evaluated at position 2o+1:
    out[o] = sum_j filt[j] * x_ext[2o + 1 - j]
with 'symmetric' = half-sample symmetric extension (edge sample
duplicated: ... x1 x0 | x0 x1 ...). The db2 (Daubechies-4-tap)
decomposition filters follow from the closed-form scaling coefficients
h = [(1+sqrt3), (3+sqrt3), (3-sqrt3), (1-sqrt3)] / (4 sqrt2) (Daubechies
1988): dec_lo = reverse(h), dec_hi = QMF high-pass (-1)^k h[k] in pywt's
storage order. dwtn applies the 1-D transform along each axis in turn
(order immaterial — the filters are separable/linear).

=== denoise_nl_means (fast_mode=True, 2-D, single channel) ===

Algorithm: Buades, Coll & Morel 2005 (non-local means) with the
uniform-patch-weight integral-image acceleration of Darbon, Cunha, Chan,
Osher & Jensen 2008 (ISBI), as described in the skimage docstring and
implemented in skimage/restoration/_nl_means_denoising.pyx. The modeled
behavior, point by point:

1. The image is padded by `offset = patch_size // 2` with np.pad
   mode='reflect' so every s x s patch window is defined; candidate
   patch CENTERS are never taken in the pad ring (see 3).
2. Patch distance D(p, q) = max(sum_window[(I(p+r) - I(q+r))^2] -
   2*sigma^2*s^2, 0) / (h^2 * s^2) — uniform (un-weighted) patch
   pixels in fast mode, noise-bias correction 2*sigma^2 subtracted
   before the clamp (skimage docstring: w = exp(-max(|P1-P2|^2 -
   2 sigma^2, 0)/h^2) with |.|^2 the per-pixel-normalized squared
   difference).
3. Shift enumeration: t_row in [-d, d], t_col in [0, d]; a pair weight
   alpha = 0.5 when t_col == 0 and t_row != 0 (those shifts are
   enumerated from both signs), else 1.0. For each shift, only center
   pixels p with BOTH p and p+t inside the un-padded image accumulate,
   and each contributes symmetrically to both pixels:
       out[p]   += alpha*w*I(p+t);  wsum[p]   += alpha*w
       out[p+t] += alpha*w*I(p);    wsum[p+t] += alpha*w
   Net effect: every pixel averages over exactly the candidates whose
   centers lie inside the image (near a border there are fewer), and the
   null shift (0,0) — enumerated once with alpha 1 and accumulated by
   both lines onto the same pixel — gives the center a DOUBLE self
   weight 2*f(0).
4. Weights w = fast_exp(-D), with contributions skipped entirely when
   D > DISTANCE_CUTOFF = 5.0. fast_exp is Schraudolph 1999 ("A fast,
   compact approximation of the exponential function", Neural
   Computation 11) as shipped in skimage/_shared/fast_exp.h: write
   EXP_A*y + (1072693248 - 60801) into the high 32-bit word of an IEEE
   double (low word zero), EXP_A = 2^20/ln 2. Relative error is a
   sawtooth of ~+-2.9% (~1.5% rms); `exact_exp=True` swaps in np.exp,
   and the golden generator records both so the approximation's output
   effect is quantified per fixture rather than assumed.
5. Accumulation in float64; final value = out/wsum, pad cropped.

Not replicated (documented divergences, both sub-tolerance or
border-artifact-level): (a) the Cython kernel computes window sums via a
rolling integral image whose row/col 0 never receives data — a zero
boundary condition whose interaction with windows that touch the first
padded row is an implementation artifact; this twin computes every
window's box sum exactly. (b) float32 inputs keep float32 storage inside
skimage's kernels; the twin accumulates in float64 throughout.
"""
from __future__ import annotations

import numpy as np

DISTANCE_CUTOFF = 5.0
# 1 / scipy.stats.norm.ppf(0.75); skimage computes the denominator via
# scipy — value to double precision
_NORM_PPF_075 = 0.6744897501960817


# ---------------------------------------------------------------------------
# fast_exp — Schraudolph (1999) double-precision trick, as in
# skimage/_shared/fast_exp.h
# ---------------------------------------------------------------------------

_EXP_A = float(1 << 20) / np.log(2.0)  # 2^20 / ln 2 = 1512775.3951951856
_EXP_BC = 1072693248 - 60801  # (1023 << 20) minus Schraudolph's RMS-optimal C


def fast_exp(y: np.ndarray) -> np.ndarray:
    """Schraudolph approximate exp for y <= 0 (vectorized, float64).

    The C code truncates EXP_A*y + (B - C) toward zero into an int32 and
    stores it as the high word of a double whose low word is 0. For the
    domain used here (y in [-DISTANCE_CUTOFF, 0]) the operand is
    positive, so truncation == floor.
    """
    y = np.asarray(y, np.float64)
    hi = np.floor(_EXP_A * y + _EXP_BC).astype(np.int64)
    return (hi << 32).view(np.float64)


# ---------------------------------------------------------------------------
# estimate_sigma twin
# ---------------------------------------------------------------------------

def _db2_filters() -> tuple[np.ndarray, np.ndarray]:
    """db2 decomposition filter pair from the Daubechies closed form."""
    s3 = np.sqrt(3.0)
    h = np.array([1 + s3, 3 + s3, 3 - s3, 1 - s3]) / (4 * np.sqrt(2.0))
    dec_lo = h[::-1].copy()
    dec_hi = np.array([-h[0], h[1], -h[2], h[3]])
    return dec_lo, dec_hi


def _pywt_dwt_1d(x: np.ndarray, filt: np.ndarray) -> np.ndarray:
    """One pywt-convention DWT pass along the LAST axis.

    out[..., o] = sum_j filt[j] * x_ext[..., 2o + 1 - j], x extended
    half-sample-symmetrically by F-1 on each side; output length
    floor((N + F - 1)/2). Spelled as an explicit per-output-tap gather
    (not np.convolve) to stay structurally independent of
    kmsr_tpu.ops.sigma.
    """
    flen = len(filt)
    n = x.shape[-1]
    # half-sample symmetric extension: [x_{F-2}..x_0 | x | x_{n-1}..]
    left = x[..., :flen - 1][..., ::-1]
    right = x[..., -(flen - 1):][..., ::-1]
    ext = np.concatenate([left, x, right], axis=-1)  # index t = pos + F-1
    n_out = (n + flen - 1) // 2
    out = np.zeros(x.shape[:-1] + (n_out,), np.float64)
    for j in range(flen):
        # x_ext position (2o + 1 - j) -> ext index (2o + 1 - j + F - 1)
        start = 1 - j + flen - 1
        out += filt[j] * ext[..., start : start + 2 * n_out : 2]
    return out


def dwt2_dd(img: np.ndarray) -> np.ndarray:
    """Diagonal ('dd') detail subband of pywt.dwtn(img, 'db2')."""
    _, dec_hi = _db2_filters()
    d = _pywt_dwt_1d(np.asarray(img, np.float64), dec_hi)  # along cols
    d = _pywt_dwt_1d(np.swapaxes(d, -1, -2), dec_hi)  # along rows
    return np.swapaxes(d, -1, -2)


def estimate_sigma_twin(img: np.ndarray) -> float:
    """skimage.restoration.estimate_sigma on a 2-D single-channel image."""
    dd = dwt2_dd(img)
    dd = dd[dd != 0]  # skimage drops exact zeros before the median
    if dd.size == 0:
        return float("nan")  # median of empty array, as skimage returns
    return float(np.median(np.abs(dd)) / _NORM_PPF_075)


# ---------------------------------------------------------------------------
# denoise_nl_means (fast_mode) twin
# ---------------------------------------------------------------------------

def _box_sum(x: np.ndarray, size: int) -> np.ndarray:
    """VALID s x s window sums by explicit slice adds (float64)."""
    hgt = x.shape[0] - size + 1
    wid = x.shape[1] - size + 1
    rows = np.zeros((hgt, x.shape[1]), np.float64)
    for r in range(size):
        rows += x[r : r + hgt, :]
    out = np.zeros((hgt, wid), np.float64)
    for c in range(size):
        out += rows[:, c : c + wid]
    return out


def fast_nl_means_2d(
    img: np.ndarray,
    patch_size: int = 7,
    patch_distance: int = 11,
    h: float = 0.1,
    sigma: float = 0.0,
    *,
    exact_exp: bool = False,
    cutoff: float = DISTANCE_CUTOFF,
) -> np.ndarray:
    """Twin of skimage `_fast_nl_means_denoising_2d` (see module docstring)."""
    img = np.asarray(img, np.float64)
    s = patch_size + 1 if patch_size % 2 == 0 else patch_size
    d = patch_distance
    n_row, n_col = img.shape
    o = s // 2
    padded = np.pad(img, o, mode="reflect")
    var2 = 2.0 * sigma * sigma
    h2s2 = h * h * s * s
    num = np.zeros_like(padded)
    wsum = np.zeros_like(padded)
    f = np.exp if exact_exp else fast_exp
    for tr in range(-d, d + 1):
        for tc in range(0, d + 1):
            alpha = 0.5 if (tc == 0 and tr != 0) else 1.0
            # padded-coordinate center range with BOTH p and p+t interior
            r0, r1 = max(o, o - tr), min(n_row + o, n_row + o - tr)
            c0, c1 = max(o, o - tc), min(n_col + o, n_col + o - tc)
            if r0 >= r1 or c0 >= c1:
                continue
            a = padded[r0 - o : r1 + o, c0 - o : c1 + o]
            b = padded[r0 - o + tr : r1 + o + tr, c0 - o + tc : c1 + o + tc]
            dist = _box_sum((a - b) ** 2, s) - var2 * s * s
            dist = np.maximum(dist, 0.0) / h2s2
            w = alpha * f(-dist)
            w[dist > cutoff] = 0.0  # skipped contributions
            vals_p = padded[r0:r1, c0:c1]
            vals_q = padded[r0 + tr : r1 + tr, c0 + tc : c1 + tc]
            num[r0:r1, c0:c1] += w * vals_q
            wsum[r0:r1, c0:c1] += w
            num[r0 + tr : r1 + tr, c0 + tc : c1 + tc] += w * vals_p
            wsum[r0 + tr : r1 + tr, c0 + tc : c1 + tc] += w
    # crop the pad ring (zero weight there) before dividing
    num = num[o : n_row + o, o : n_col + o]
    wsum = wsum[o : n_row + o, o : n_col + o]
    return num / wsum
