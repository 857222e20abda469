"""Pallas fused degrade vs the XLA reference path (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.ops import degrade
from kmsr_tpu.ops.degrade_pallas import degrade_pallas, degrade_pallas_chwb

pytestmark = pytest.mark.slow  # >5s measured on the 1-core CI host


@pytest.fixture
def data(rng):
    img = rng.normal(5, 2, size=(4, 5, 64, 64)).astype(np.float32)
    kernel = rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(kernel)


def test_pallas_matches_xla(data):
    img, kernel = data
    want = np.asarray(degrade(img, kernel, factor=8))
    got = np.asarray(degrade_pallas(img, kernel, factor=8, interpret=True))
    assert got.shape == want.shape == (4, 5, 8, 8)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_factor4(rng):
    img = jnp.asarray(rng.normal(size=(2, 5, 32, 32)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32))
    want = np.asarray(degrade(img, kernel, factor=4))
    got = np.asarray(degrade_pallas(img, kernel, factor=4, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_fused_noise(data, rng):
    img, kernel = data
    noise = rng.normal(0, 0.1, size=(4, 5, 8, 8)).astype(np.float32)
    want = np.asarray(degrade(img, kernel, factor=8)) + noise
    got = np.asarray(
        degrade_pallas(img, kernel, noise=jnp.asarray(noise), factor=8, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_chwb_layout(data):
    img, kernel = data
    x = jnp.transpose(img, (1, 2, 3, 0))
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - 4)))
    out = degrade_pallas_chwb(x, kernel, factor=8, interpret=True)
    assert out.shape == (5, 8, 8, 128)
    want = np.asarray(degrade(img, kernel, factor=8))
    got = np.asarray(jnp.transpose(out, (3, 0, 1, 2))[:4])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_nonsquare_batch(rng):
    """Batch not a multiple of 128 gets padded internally."""
    img = jnp.asarray(rng.normal(size=(3, 5, 16, 16)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(5, 13, 13)).astype(np.float32))
    want = np.asarray(degrade(img, kernel, factor=8))
    got = np.asarray(degrade_pallas(img, kernel, factor=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_v1_v2_agree(data, rng):
    """The all-phases v2 kernel (input crosses HBM once) must match the
    v1 phase-grid kernel exactly; both with fused noise."""
    img, kernel = data
    x = jnp.transpose(img, (1, 2, 3, 0))  # CHWB
    pad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - x.shape[-1])))
    noise = jnp.asarray(rng.normal(0, 0.1, (5, 8, 8, 128)).astype(np.float32))
    o1 = np.asarray(degrade_pallas_chwb(pad, kernel, noise=noise, factor=8,
                                        interpret=True, version=1))
    o2 = np.asarray(degrade_pallas_chwb(pad, kernel, noise=noise, factor=8,
                                        interpret=True, version=2))
    np.testing.assert_allclose(o1, o2, rtol=1e-6, atol=1e-6)


def test_pallas_v3_fused_pad_free(rng):
    """v3 (raw-layout, in-kernel phase split + clamped replicate taps)
    must match the XLA replicate-pad degrader; small shapes keep the
    interpret-mode compile time reasonable."""
    img = rng.normal(5, 2, (3, 5, 16, 16)).astype(np.float32)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    from kmsr_tpu.ops.degrade import degrade_strided

    want = np.asarray(degrade_strided(jnp.asarray(img), kernel, factor=8))
    xc = jnp.pad(jnp.asarray(np.transpose(img, (1, 2, 3, 0))),
                 ((0, 0), (0, 0), (0, 0), (0, 125)))
    out = degrade_pallas_chwb(xc, kernel, factor=8, interpret=True, version=3)
    got = np.transpose(np.asarray(out)[..., :3], (3, 0, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # wide-span lattice (|q| <= 2): 13x13 blur at factor 4 has span 16
    # (> 3*4, <= 5*4) — the extended v3 must match the oracle too
    want4 = np.asarray(degrade_strided(jnp.asarray(img), kernel, factor=4))
    out4 = degrade_pallas_chwb(xc, kernel, factor=4, interpret=True, version=3)
    got4 = np.transpose(np.asarray(out4)[..., :3], (3, 0, 1, 2))
    np.testing.assert_allclose(got4, want4, rtol=1e-4, atol=1e-5)

    # span guard still enforced beyond 5*factor: factor 2 -> span 14 > 10
    with pytest.raises(ValueError, match="span"):
        degrade_pallas_chwb(xc, kernel, factor=2, interpret=True, version=3)


def test_pallas_bf16_input_storage(rng):
    """bf16 input storage is accepted (upcast in VMEM, f32 accumulate).
    Its quantization error (~4e-3 rel RMSE measured on radiance-scale
    data) exceeds the 1e-3 parity budget, so f32 stays the default —
    this pins the contract: runs, close, but NOT parity-grade."""
    x = rng.normal(5, 2, (2, 16, 16, 128)).astype(np.float32)
    k = rng.uniform(0, 1, (2, 5, 5)).astype(np.float32)
    f32 = np.asarray(degrade_pallas_chwb(
        jnp.asarray(x), jnp.asarray(k), factor=4, interpret=True))
    b16 = np.asarray(degrade_pallas_chwb(
        jnp.asarray(x).astype(jnp.bfloat16), jnp.asarray(k), factor=4,
        interpret=True))
    assert b16.dtype == np.float32
    rel = np.sqrt(np.mean((b16 - f32) ** 2)) / np.std(f32)
    assert rel < 0.02, rel           # close (bf16 quantization scale)
    assert not np.allclose(b16, f32, atol=1e-5)  # but not parity-grade


@pytest.mark.parametrize("mode", [
    "split3",
    pytest.param("split2", marks=pytest.mark.exhaustive),  # canonical: split3 (same bf16-term machinery, one fewer pass)
    "highest",
])
def test_pallas_v3_perm_modes_match(rng, mode):
    """The bf16-term split permutation matmuls (2-3 one-pass MXU ops)
    must match the XLA oracle as tightly as the 6-pass HIGHEST matmul:
    a 0/1 permutation matmul selects (never accumulates), so exact bf16
    term splitting reproduces the f32 permutation to <=2^-16 rel."""
    from kmsr_tpu.ops.degrade import degrade_strided

    img = rng.normal(5, 2, (2, 5, 16, 16)).astype(np.float32)
    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    want = np.asarray(degrade_strided(jnp.asarray(img), kernel, factor=8))
    xc = jnp.pad(jnp.asarray(np.transpose(img, (1, 2, 3, 0))),
                 ((0, 0), (0, 0), (0, 0), (0, 126)))
    out = degrade_pallas_chwb(
        xc, kernel, factor=8, interpret=True, version=3, perm_mode=mode)
    got = np.transpose(np.asarray(out)[..., :2], (3, 0, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bf16_terms_partition(rng):
    """_bf16_terms must yield a true magnitude-ordered partition on EVERY
    backend. The original convert-roundtrip spelling degenerated to
    [bf16(a), 0, 0] under XLA-on-TPU jit (the f32->bf16->f32 roundtrip is
    folded to identity there), which silently dropped v4's correction
    passes — found on hardware at 7.5e-4 max rel by scripts/tpu_parity.py.
    The masking spelling is platform-independent; this pins its contract
    where CI can see it."""
    import jax

    from kmsr_tpu.ops.degrade_pallas import _bf16_terms

    a = jnp.asarray(rng.normal(0, 1, (64, 128)).astype(np.float32))
    terms = jax.jit(lambda v: [t.astype(jnp.float32)
                               for t in _bf16_terms(v, 3)])(a)
    t = [np.asarray(x, np.float64) for x in terms]
    # near-exact partition: only the LAST term's bf16 store may round
    # (remainder after two 7-bit maskings can hold ~10 bits)
    m_a = float(np.max(np.abs(np.asarray(a))))
    np.testing.assert_allclose(
        t[0] + t[1] + t[2], np.asarray(a, np.float64),
        rtol=0, atol=2.0 ** -21 * m_a,
    )
    # magnitude-ordered: term i carries ~2^-7i of the value
    m = float(np.max(np.abs(np.asarray(a))))
    assert float(np.max(np.abs(t[1]))) < 2.0 ** -6 * m
    assert float(np.max(np.abs(t[2]))) < 2.0 ** -13 * m
    # NOT degenerate: random f32 data is not bf16-exact, so the residual
    # terms must be nonzero (the folded-roundtrip failure mode)
    assert float(np.max(np.abs(t[1]))) > 0
    assert float(np.max(np.abs(t[2]))) > 0


def test_pallas_v4_dense_mxu_stencil(rng):
    """v4 (whole stencil as dense bf16-term-split MXU matmuls) must
    match the XLA oracle at BOTH narrow (f=8, span 20 <= 24) and wide
    (f=4, span 16 > 12, where v3 is unavailable and auto picks v4)
    spans, with fused noise riding the same pass."""
    from kmsr_tpu.ops.degrade import degrade_strided

    kernel = jnp.asarray(rng.uniform(0, 1, (5, 13, 13)).astype(np.float32))
    # f=8 needs w>=64 for out_w%8; f=4 covers the wide-span auto case
    for f, side in ((8, 64), (4, 32)):
        img = rng.normal(5, 2, (2, 5, side, side)).astype(np.float32)
        xi = jnp.pad(jnp.asarray(np.transpose(img, (1, 2, 3, 0))),
                     ((0, 0), (0, 0), (0, 0), (0, 126)))
        want = np.asarray(degrade_strided(jnp.asarray(img), kernel, factor=f))
        out = degrade_pallas_chwb(
            xi, kernel, factor=f, interpret=True, version=4)
        got = np.transpose(np.asarray(out)[..., :2], (3, 0, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    img = rng.normal(5, 2, (2, 5, 32, 32)).astype(np.float32)
    xc = jnp.pad(jnp.asarray(np.transpose(img, (1, 2, 3, 0))),
                 ((0, 0), (0, 0), (0, 0), (0, 126)))
    # fused noise is exact on top of the stencil
    noise = jnp.asarray(rng.normal(0, 0.5, (5, 8, 8, 128)).astype(np.float32))
    base = np.asarray(degrade_pallas_chwb(
        xc, kernel, factor=4, interpret=True, version=4))
    fused = np.asarray(degrade_pallas_chwb(
        xc, kernel, noise=noise, factor=4, interpret=True, version=4))
    np.testing.assert_allclose(fused, base + np.asarray(noise), atol=1e-6)


def test_presplit_matches_chwb(rng):
    """Pre-split layout path ≡ natural-layout v3 (bit-exact: same lattice,
    same clamped-tap replicate padding — only the layout work moves
    upstream)."""
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 32, 32, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 0.1, size=(2, 4, 4, 8)).astype(np.float32))
    want = np.asarray(
        degrade_pallas_chwb(x, kernel, noise=noise, factor=8, batch_tile=8,
                            interpret=True)
    )
    xp = phase_split_chwb(x, factor=8)
    assert xp.shape == (2, 8, 32 // 8 + 2, 32, 8)
    got = np.asarray(
        degrade_pallas_presplit(xp, kernel, noise=noise, factor=8,
                                batch_tile=8, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_presplit_halo_free_matches_chwb(rng):
    """baked_halo=False presplit layout (natural byte count, replicate
    padding reconstructed in-kernel via per-edge-dy concats) is
    BIT-exact vs natural-layout v3, with and without fused noise."""
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 32, 32, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 0.1, size=(2, 4, 4, 8)).astype(np.float32))
    xp = phase_split_chwb(x, factor=8, halo=False)
    assert xp.shape == (2, 8, 32 // 8, 32, 8)
    for noise_arg in (None, noise):
        want = np.asarray(
            degrade_pallas_chwb(x, kernel, noise=noise_arg, factor=8,
                                batch_tile=8, interpret=True)
        )
        got = np.asarray(
            degrade_pallas_presplit(
                xp, kernel, noise=noise_arg, factor=8, batch_tile=8,
                interpret=True, baked_halo=False,
            )
        )
        np.testing.assert_array_equal(got, want)


def test_presplit_factor4_wide_span(rng):
    """Factor-4 (span 16 > 3*4: the MoE production decimation,
    train_gemini.py:134) through BOTH presplit layouts must equal the
    natural-layout extended v3 (to f32 rounding: the padded-column chwb
    graph and the concat-based presplit graph reassociate fma chains
    differently under XLA — measured 9e-8 max rel), and all must match
    the XLA oracle."""
    from kmsr_tpu.ops.degrade import degrade_strided
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 32, 32, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    noise = jnp.asarray(rng.normal(0, 0.1, size=(2, 8, 8, 8)).astype(np.float32))
    img = jnp.transpose(x, (3, 0, 1, 2))
    want_oracle = np.asarray(degrade_strided(img, kernel, factor=4))
    want = np.asarray(
        degrade_pallas_chwb(x, kernel, noise=noise, factor=4, batch_tile=8,
                            interpret=True, version=3)
    )
    np.testing.assert_allclose(
        np.transpose(want - np.asarray(noise), (3, 0, 1, 2)),
        want_oracle, rtol=1e-4, atol=1e-5,
    )
    # halo-free layout
    xp = phase_split_chwb(x, factor=4, halo=False)
    assert xp.shape == (2, 4, 8, 32, 8)
    got = np.asarray(
        degrade_pallas_presplit(xp, kernel, noise=noise, factor=4,
                                batch_tile=8, interpret=True,
                                baked_halo=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # baked-halo layout needs 2 halo rows at span 16
    xp2 = phase_split_chwb(x, factor=4, halo_rows=2)
    assert xp2.shape == (2, 4, 8 + 4, 32, 8)
    got2 = np.asarray(
        degrade_pallas_presplit(xp2, kernel, noise=noise, factor=4,
                                batch_tile=8, interpret=True)
    )
    np.testing.assert_allclose(got2, want, rtol=1e-6, atol=1e-6)


def test_presplit_matches_native_loader_layout(rng, tmp_path):
    """The C++ loader's split gather feeds degrade_pallas_presplit
    directly: end-to-end .npy files -> native split batch -> kernel
    matches the XLA reference degrade."""
    pytest.importorskip("ctypes")
    from kmsr_tpu.ops.degrade_pallas import degrade_pallas_presplit
    from kmsr_tpu.runtime import NativeLoaderUnavailable, NativePatchLoader

    arrays = [
        rng.normal(5, 2, size=(2, 16, 16)).astype(np.float32) for _ in range(4)
    ]
    paths = []
    for i, a in enumerate(arrays):
        p = tmp_path / f"p{i}.npy"
        np.save(p, a)
        paths.append(str(p))
    try:
        loader = NativePatchLoader(paths, shape=(2, 16, 16), n_threads=2)
    except NativeLoaderUnavailable as e:
        pytest.skip(f"no native toolchain: {e}")
    idx = np.array([1, 3, 0, 2], np.int64)
    xp = jnp.asarray(loader.gather_split(idx, factor=4))
    xn = jnp.asarray(loader.gather_split(idx, factor=4, halo=False))
    loader.close()
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 7, 7)).astype(np.float32))
    img = jnp.asarray(np.stack([arrays[i] for i in idx]))  # [B, C, H, W]
    want = np.transpose(np.asarray(degrade(img, kernel, factor=4)),
                        (1, 2, 3, 0))
    got = np.asarray(
        degrade_pallas_presplit(xp, kernel, factor=4, batch_tile=4,
                                interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # halo-free loader layout (the factory npy production route)
    got_n = np.asarray(
        degrade_pallas_presplit(xn, kernel, factor=4, batch_tile=4,
                                interpret=True, baked_halo=False)
    )
    np.testing.assert_allclose(got_n, want, rtol=1e-4, atol=1e-5)


def test_presplit_bf16_storage(rng):
    """bf16-stored pre-split pools are consumed directly (tap fmas
    promote to the f32 accumulator); error stays at bf16 quantization
    scale."""
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 32, 32, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    want = np.asarray(
        degrade_pallas_presplit(phase_split_chwb(x, 8), kernel, factor=8,
                                batch_tile=8, interpret=True)
    )
    got = np.asarray(
        degrade_pallas_presplit(
            phase_split_chwb(x, 8).astype(jnp.bfloat16), kernel, factor=8,
            batch_tile=8, interpret=True,
        )
    )
    assert got.dtype == np.float32
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-2, rel


def test_presplit_halo_rows_mismatch_raises(rng):
    """A baked-halo layout built with the WRONG halo depth for the kernel
    span must raise when the caller declares halo_rows, instead of
    silently misreading real rows as halo (ADVICE r3 medium)."""
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 32, 32, 8)).astype(np.float32))
    # span-16 kernel at factor 4 needs halo depth m=2
    kernel = jnp.asarray(rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    xp_bad = phase_split_chwb(x, factor=4, halo_rows=1)
    with pytest.raises(ValueError, match="halo_rows=1"):
        degrade_pallas_presplit(xp_bad, kernel, factor=4, batch_tile=8,
                                interpret=True, halo_rows=1)
    # declaring the matching depth passes through
    xp_ok = phase_split_chwb(x, factor=4, halo_rows=2)
    got = np.asarray(
        degrade_pallas_presplit(xp_ok, kernel, factor=4, batch_tile=8,
                                interpret=True, halo_rows=2)
    )
    want = np.asarray(
        degrade_pallas_presplit(xp_ok, kernel, factor=4, batch_tile=8,
                                interpret=True)
    )
    np.testing.assert_array_equal(got, want)
    # halo-free layouts take no halo_rows
    xn = phase_split_chwb(x, factor=4, halo=False)
    with pytest.raises(ValueError, match="halo-free"):
        degrade_pallas_presplit(xn, kernel, factor=4, batch_tile=8,
                                interpret=True, baked_halo=False,
                                halo_rows=1)


def test_presplit_no_rows_remaining_raises(rng):
    """A layout whose row-blocks are all consumed by the derived halo
    depth (kernel/layout mismatch) raises instead of emitting a
    zero-height output."""
    from kmsr_tpu.ops.degrade_pallas import (
        degrade_pallas_presplit,
        phase_split_chwb,
    )

    x = jnp.asarray(rng.normal(5, 2, size=(2, 8, 32, 8)).astype(np.float32))
    kernel = jnp.asarray(
        rng.uniform(0, 1, size=(2, 13, 13)).astype(np.float32))
    # H=8 at factor 4 -> 2 image row-blocks; halo_rows=1 bakes 2 halo
    # rows; span 16 derives m=2 -> 4 claimed halo rows > 4 total
    xp = phase_split_chwb(x, factor=4, halo_rows=1)
    with pytest.raises(ValueError, match="no image rows remain"):
        degrade_pallas_presplit(xp, kernel, factor=4, batch_tile=8,
                                interpret=True)
