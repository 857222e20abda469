"""SR quality demo: train the SR CNN on factory-degraded structured data
and compare PSNR/SSIM against the bilinear x8 baseline.

Measured on one TPU v5e chip (1500 iters, width 64, 8 blocks, ~1 min):
    bilinear x8 baseline: 35.9 dB
    oneshot:     41.0 dB (+5.0), SSIM 0.983
    progressive: 41.4 dB (+5.5), SSIM 0.987

Run from the repo root: python examples/sr_quality_demo.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
from kmsr_tpu.models import gaussian_kernel
from kmsr_tpu.models.sr import SRConfig, init_sr, sr_forward, bilinear_upsample
from kmsr_tpu.ops import degrade
from kmsr_tpu.train.sr import SRTrainConfig, train_sr, evaluate_sr

rng = np.random.default_rng(0)
# structured HR: superposed smooth gradients + blobs (ocean-color-like)
N, S = 256, 128
yy, xx = np.meshgrid(np.linspace(0,1,S), np.linspace(0,1,S), indexing="ij")
hr = np.empty((N,5,S,S), np.float32)
for i in range(N):
    base = 3 + 0.8*np.sin(2*np.pi*(rng.uniform(0.5,3)*xx + rng.uniform())) \
             + 0.8*np.cos(2*np.pi*(rng.uniform(0.5,3)*yy + rng.uniform()))
    for c in range(5):
        blobs = np.zeros((S,S), np.float32)
        for _ in range(6):
            cy, cx, s, a = rng.uniform(0,1), rng.uniform(0,1), rng.uniform(0.01,0.08), rng.normal(0,0.8)
            blobs += a*np.exp(-((yy-cy)**2+(xx-cx)**2)/(2*s*s))
        hr[i,c] = base + blobs + rng.normal(0, 0.02, (S,S))
# degrade: sigma 2.5 gaussian blur + x8 + noise (the factory path)
k = np.asarray(gaussian_kernel(13, 2.5))
lr = np.asarray(degrade(jnp.asarray(hr), jnp.asarray(k), factor=8))
lr = lr + rng.normal(0, 0.05, lr.shape).astype(np.float32); lr = lr.astype(np.float32)
lr_tr, hr_tr = lr[:224], hr[:224]
lr_te, hr_te = lr[224:], hr[224:]

# bilinear baseline PSNR
from kmsr_tpu.ops.metrics import psnr
base_pred = np.asarray(bilinear_upsample(jnp.asarray(lr_te), 8))
dr = float(hr_te.max() - hr_te.min())
base_psnr = np.mean([float(psnr(jnp.asarray(base_pred[i]), jnp.asarray(hr_te[i]), dr)) for i in range(32)])
print(f"bilinear x8 baseline: {base_psnr:.2f} dB", flush=True)

for ups in ("oneshot", "progressive"):
    cfg = SRTrainConfig(iters=1500, batch_size=32, lr_rate=2e-4,
        model=SRConfig(width=64, n_blocks=8, factor=8, upsampler=ups),
        log_every=500, eval_every=10**9, outdir=f"/tmp/sr_q_{ups}", seed=0)
    t0=time.time()
    out = train_sr((lr_tr, hr_tr), cfg, progress=False)
    ev = evaluate_sr(jax.device_get(out["state"].params), lr_te, hr_te, cfg.model)
    print(f"{ups}: PSNR {ev['psnr']:.2f} dB (+{ev['psnr']-base_psnr:.2f} vs bilinear), "
          f"SSIM {ev['ssim']:.4f}, trained 1500 iters in {time.time()-t0:.0f}s", flush=True)
