"""Phase-plane scene degrade: parity with the conv path on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.ops.degrade import (
    compose_with_box,
    depthwise_conv2d,
    normalize_kernel,
    replicate_pad,
)
from kmsr_tpu.ops.degrade_scene_fast import (
    _pick_tile,
    degrade_rows_fast,
    degrade_slab_fast,
    extend_rows_edge,
    halo_rows,
    phase_split,
    slab_halo,
)


def _oracle(scene, kernel, factor):
    """replicate-pad + composed strided depthwise conv (the parity spec)."""
    comp = compose_with_box(normalize_kernel(kernel), factor)
    kh = kernel.shape[-1]
    xp = replicate_pad(scene[None], kh // 2, kh // 2)
    return depthwise_conv2d(xp, comp, stride=factor)[0]


@pytest.mark.parametrize(
    "c,h,w,f,k",
    [(5, 128, 96, 8, 13), (3, 64, 64, 4, 13), (2, 48, 80, 8, 7), (1, 36, 36, 3, 5)],
)
def test_slab_fast_xla_matches_conv(rng, c, h, w, f, k):
    scene = jnp.asarray(rng.normal(5, 2, (c, h, w)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (c, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    want = _oracle(scene, kernel, f)
    got = degrade_slab_fast(extend_rows_edge(scene, f, comp.shape[-1]), comp, f, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_slab_fast_pallas_interpret_matches_xla(rng):
    f, k = 8, 13
    scene = jnp.asarray(rng.normal(5, 2, (2, 128, 96)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (2, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    x_ext = extend_rows_edge(scene, f, comp.shape[-1])
    want = degrade_slab_fast(x_ext, comp, f, impl="xla")
    got = degrade_slab_fast(x_ext, comp, f, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_phase_split_definition(rng):
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    for strategy in ("transpose", "slices"):
        ph = np.asarray(phase_split(x, 4, strategy))
        xs = np.asarray(x)
        for p in range(4):
            for q in range(4):
                np.testing.assert_array_equal(ph[:, p, q], xs[:, p::4, q::4])


def test_phase_split_shape_gate():
    with pytest.raises(ValueError):
        phase_split(jnp.zeros((1, 30, 32)), 4)


def test_pick_tile_rules():
    # (out_h, factor, next_block): f*rt must divide into 8-sublane and
    # NX-row block granularity, rt into out_h
    assert _pick_tile(1024, 8, 16) == 16
    assert _pick_tile(64, 8, 16) == 16
    assert _pick_tile(8, 8, 16) == 8
    assert _pick_tile(12, 4, 16) == 12  # f*rt = 48, mult of 8 and 16
    assert _pick_tile(3, 3, 16) is None  # f*rt in {9, 3}: no legal block
    # rt itself must be a Mosaic-legal OUT-block sublane dim: divisible
    # by 8 or equal to out_h. A prime out_h (127 = 1016/8, from an odd
    # 1019-row scene) only offers rt=1, which the real-TPU lowering
    # rejects even though interpret mode accepts it — the picker must
    # return None so degrade_rows_fast/slab_fast take the XLA fallback.
    from kmsr_tpu.ops.degrade_scene_fast import _pick_tile_raw

    assert _pick_tile(127, 8, 8) is None
    assert _pick_tile_raw(127, 8, 8, 8) is None
    # non-prime but 8-free divisors ≤ target also fall back (e.g. 2·61)
    assert _pick_tile_raw(122, 8, 8, 8) is None


def _edge_halos(scene, factor, ksize):
    """Edge-replicated thin halos (the whole-scene / global-edge case)."""
    th, bh = halo_rows(factor, ksize)
    top = jnp.repeat(scene[:, :1], max(th, 1), axis=1)
    bot = jnp.repeat(scene[:, -1:], max(bh, 1), axis=1)
    return top, bot


@pytest.mark.parametrize(
    "c,h,w,f,k",
    [(5, 128, 96, 8, 13), (3, 64, 64, 4, 13), (2, 48, 80, 8, 7), (1, 36, 36, 3, 5)],
)
def test_rows_fast_xla_matches_conv(rng, c, h, w, f, k):
    scene = jnp.asarray(rng.normal(5, 2, (c, h, w)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (c, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    top, bot = _edge_halos(scene, f, comp.shape[-1])
    want = _oracle(scene, kernel, f)
    got = degrade_rows_fast(scene, comp, f, top, bot, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_rows_fast_neighbor_halos_tile_exactly(rng):
    """Two raw slabs fed each other's REAL rows reassemble the full-scene
    oracle bit-for-bit (the sharded `_thin_halo` contract)."""
    f, k = 8, 13
    scene = jnp.asarray(rng.normal(5, 2, (2, 256, 96)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (2, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    th, bh = halo_rows(f, comp.shape[-1])
    want = _oracle(scene, kernel, f)
    hs = scene.shape[1] // 2
    lo, hi = scene[:, :hs], scene[:, hs:]
    edge_top, edge_bot = _edge_halos(scene, f, comp.shape[-1])
    out_lo = degrade_rows_fast(
        lo, comp, f, edge_top, hi[:, :bh], impl="xla")
    out_hi = degrade_rows_fast(
        hi, comp, f, lo[:, hs - th:], edge_bot, impl="xla")
    got = jnp.concatenate([out_lo, out_hi], axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_rows_fast_pallas_interpret_matches_xla(rng):
    f, k = 8, 13
    scene = jnp.asarray(rng.normal(5, 2, (2, 128, 96)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (2, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    top, bot = _edge_halos(scene, f, comp.shape[-1])
    want = degrade_rows_fast(scene, comp, f, top, bot, impl="xla")
    got = degrade_rows_fast(
        scene, comp, f, top, bot, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_rows_fast_thin_slab_falls_back(rng):
    """A slab thinner than the edge strip-conv reach must take the XLA
    path (which handles it) instead of returning a wrong-shaped result
    from the Pallas assembly (regression: an 8-row f=8 slab returned
    shape (c, 0, out_w) with no exception)."""
    f, k = 8, 13
    scene = jnp.asarray(rng.normal(5, 2, (2, 8, 96)).astype(np.float32))
    kernel = jnp.asarray(rng.uniform(0, 1, (2, k, k)).astype(np.float32))
    comp = compose_with_box(normalize_kernel(kernel), f)
    top, bot = _edge_halos(scene, f, comp.shape[-1])
    want = _oracle(scene, kernel, f)
    for impl in ("pallas", "auto", "xla"):
        got = degrade_rows_fast(scene, comp, f, top, bot, impl=impl)
        assert got.shape == want.shape, (impl, got.shape)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_halo_rows_contract():
    # production case: 13x13 blur composed with the x8 box -> 20x20
    assert halo_rows(8, 20) == (6, 6)
    assert halo_rows(4, 16) == (6, 6)
    assert halo_rows(3, 7) == (2, 2)
    # halos are always thinner than the extended-slab contract
    for f, ks in [(8, 20), (4, 16), (3, 7), (8, 15)]:
        th, bh = halo_rows(f, ks)
        top, bot = slab_halo(f, ks)
        assert th <= top and bh <= bot


def test_slab_halo_contract():
    top, bot = slab_halo(8, 20)  # k=13 composed: half=6 -> nb=1
    assert top == 8 and bot == 8
    top, bot = slab_halo(4, 16)  # f=4, k=13: half=6 -> nb=2
    assert top == 8 and bot == 8
    top, bot = slab_halo(3, 7)  # f=3, k=5: half=2 -> nb=1
    assert top == 3 and (top + bot) % 3 == 0 and bot >= 5
