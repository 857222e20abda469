"""SR model, metrics, training and inference-stage tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmsr_tpu.models.sr import (
    SRConfig,
    count_params,
    init_sr,
    pixel_shuffle,
    sr_forward,
)
from kmsr_tpu.ops.metrics import psnr, ssim

CFG = SRConfig(width=16, n_blocks=2, factor=8)


def test_pixel_shuffle_roundtrip(rng):
    x = rng.normal(size=(2, 20, 4, 4)).astype(np.float32)
    y = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    assert y.shape == (2, 5, 8, 8)
    # exact element mapping: out[b,c,2i+r,2j+s] == x[b, c*4 + r*2 + s, i, j]
    assert y[0, 0, 0, 0] == x[0, 0, 0, 0]
    assert y[0, 0, 0, 1] == x[0, 1, 0, 0]
    assert y[0, 0, 1, 0] == x[0, 2, 0, 0]
    assert y[0, 1, 1, 1] == x[0, 7, 0, 0]


@pytest.mark.slow
def test_sr_forward_shapes(rng):
    params = init_sr(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8)).astype(np.float32))
    y = sr_forward(params, x, CFG)
    assert y.shape == (2, 5, 64, 64)
    assert y.dtype == jnp.float32
    assert count_params(params) > 0


def test_sr_oneshot_upsampler_shapes(rng):
    cfg = SRConfig(width=16, n_blocks=2, factor=8, upsampler="oneshot")
    params = init_sr(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8)).astype(np.float32))
    y = sr_forward(params, x, cfg)
    assert y.shape == (2, 5, 64, 64)
    assert np.isfinite(np.asarray(y)).all()
    # oneshot tail lives entirely at LR: strictly fewer HR-space params
    assert "ups" in params and len(params["ups"]) == 0


def test_bilinear_matmul_matches_image_resize(rng):
    """The MXU matmul skip must equal jax.image.resize bilinear."""
    from kmsr_tpu.models.sr import bilinear_upsample

    x = jnp.asarray(rng.normal(3, 1, (2, 5, 8, 8)).astype(np.float32))
    got = np.asarray(bilinear_upsample(x, 4))
    want = np.asarray(
        jax.image.resize(x, (2, 5, 32, 32), method="bilinear")
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sr_progressive_requires_pow2_factor():
    with pytest.raises(ValueError):
        init_sr(jax.random.PRNGKey(0), SRConfig(factor=6))
    # oneshot accepts arbitrary integer factors
    cfg = SRConfig(width=8, n_blocks=1, factor=6, upsampler="oneshot")
    params = init_sr(jax.random.PRNGKey(0), cfg)
    y = sr_forward(params, jnp.ones((1, 5, 8, 8)), cfg)
    assert y.shape == (1, 5, 48, 48)


def test_sr_bf16_close_to_f32(rng):
    params = init_sr(jax.random.PRNGKey(0), CFG)
    x = jnp.asarray(rng.normal(2.0, 1.0, size=(1, 5, 8, 8)).astype(np.float32))
    y16 = np.asarray(sr_forward(params, x, CFG, compute_dtype=jnp.bfloat16))
    y32 = np.asarray(sr_forward(params, x, CFG, compute_dtype=jnp.float32))
    rel = np.abs(y16 - y32) / (np.abs(y32) + 1e-3)
    assert np.median(rel) < 0.05


def test_metrics():
    a = jnp.ones((5, 32, 32))
    assert float(psnr(a, a, 1.0)) > 100
    assert float(ssim(a, a, 1.0)) == pytest.approx(1.0, abs=1e-5)
    b = a + 0.1
    assert 15 < float(psnr(a, b, 1.0)) < 25
    rng = np.random.default_rng(0)
    noisy = a + jnp.asarray(rng.normal(0, 0.2, a.shape).astype(np.float32))
    assert float(ssim(a, noisy, 1.0)) < 0.9


@pytest.mark.slow
def test_sr_training_reduces_loss(rng):
    from kmsr_tpu.train.sr import SRTrainConfig, init_sr_training, make_sr_train_step

    cfg = SRTrainConfig(
        iters=30, batch_size=4, model=SRConfig(width=8, n_blocks=1, factor=4),
        compute_dtype="float32",
    )
    hr = rng.normal(3.0, 1.0, size=(16, 5, 16, 16)).astype(np.float32)
    lr = hr.reshape(16, 5, 4, 4, 4, 4).mean(axis=(3, 5))
    step_fn, _ = make_sr_train_step(cfg)
    state = init_sr_training(cfg)
    losses = []
    for t in range(cfg.iters):
        idx = rng.integers(0, 16, 4)
        state, m = step_fn(state, jnp.asarray(lr[idx]), jnp.asarray(hr[idx]))
        losses.append(float(m["l1"]))
    assert losses[-1] < losses[0]


def test_sr_infer_stage(tmp_path, rng):
    from kmsr_tpu.io import GROUP_HR, GROUP_LR, read_band_stack, write_band_stack
    from kmsr_tpu.pipeline.sr_infer import main as sr_main
    from kmsr_tpu.train.sr import SRTrainConfig, init_sr_training
    from kmsr_tpu.utils import save_params

    cfg = SRConfig(width=8, n_blocks=1, factor=4)
    params = init_sr(jax.random.PRNGKey(0), cfg)
    model_path = tmp_path / "sr_model.npz"
    save_params(str(model_path), params)

    data_dir = tmp_path / "pairs"
    data_dir.mkdir()
    for n in ["s1", "s2"]:
        hr = rng.normal(3, 1, size=(5, 32, 32)).astype(np.float32)
        lr = hr.reshape(5, 8, 4, 8, 4).mean(axis=(2, 4))
        write_band_stack(data_dir / f"{n}.nc", GROUP_HR, hr, mode="w")
        write_band_stack(data_dir / f"{n}.nc", GROUP_LR, lr, mode="a")

    out_dir = tmp_path / "sr_out"
    rc = sr_main(
        [
            "--input-dir", str(data_dir),
            "--model", str(model_path),
            "--output-dir", str(out_dir),
            "--factor", "4", "--width", "8", "--n-blocks", "1",
        ]
    )
    assert rc == 0
    outs = sorted(out_dir.glob("*_sr.nc"))
    assert len(outs) == 2
    sr = read_band_stack(outs[0], "sr")
    assert sr.shape == (5, 32, 32)


def test_params_io_roundtrip(rng):
    from kmsr_tpu.utils import load_params, save_params

    params = init_sr(jax.random.PRNGKey(0), CFG)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.npz")
        save_params(path, params)
        loaded = load_params(path, init_sr(jax.random.PRNGKey(1), CFG))
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sr_checkpoint_resume(tmp_path, rng):
    """SR trainer orbax checkpoint + resume (review finding: the module
    promised checkpointing but had none)."""
    from kmsr_tpu.train.sr import SRTrainConfig, train_sr

    lr = rng.normal(3, 1, (6, 5, 4, 4)).astype(np.float32)
    hr = rng.normal(3, 1, (6, 5, 16, 16)).astype(np.float32)

    def cfg(iters):
        return SRTrainConfig(
            iters=iters, batch_size=2, log_every=2, eval_every=100,
            ckpt_every=2, resume=True, outdir=str(tmp_path),
            model=SRConfig(width=8, n_blocks=1, factor=4),
            compute_dtype="float32",
        )

    train_sr((lr, hr), cfg(2), progress=False)
    assert (tmp_path / "ckpt" / "step_2").exists()
    out = train_sr((lr, hr), cfg(4), progress=False)
    assert int(out["state"].step) == 4


@pytest.mark.slow
def test_real_is_lr_requires_lr_pool(tmp_path):
    from kmsr_tpu.data import synthetic_pool
    from kmsr_tpu.models import DiscriminatorConfig, GeneratorConfig
    from kmsr_tpu.train import SingleKernelConfig, train_single_kernel

    rng = np.random.default_rng(0)
    pool = synthetic_pool(rng, n=4, size=64, blur_sigma=None)
    cfg = SingleKernelConfig(
        iters=2, hr_patch_size=64, lr_crop_size=8, batch_size=2,
        log_every=2, kernel_log_every=2, outdir=str(tmp_path),
        verbose=False, real_is_lr=True,
        generator=GeneratorConfig(mid_ch=8),
        discriminator=DiscriminatorConfig(base_ch=8, num_blocks=2),
    )
    with pytest.raises(ValueError, match="real_is_lr"):
        train_single_kernel(pool, cfg, progress=False)
    # wrong-size lr_pool also rejected
    with pytest.raises(ValueError, match="lr_crop_size"):
        train_single_kernel(
            pool, cfg, progress=False,
            lr_pool=synthetic_pool(rng, n=4, size=16, blur_sigma=None),
        )
    # correct native-LR pool trains
    import dataclasses as dc

    cfg_ok = dc.replace(cfg, device_pool=False)
    out = train_single_kernel(
        pool, cfg_ok, progress=False,
        lr_pool=synthetic_pool(rng, n=4, size=8, blur_sigma=None),
    )
    assert np.isfinite(out["kernel_per_band"]).all()
