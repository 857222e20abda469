#!/usr/bin/env bash
# End-to-end kmsr_tpu pipeline on synthetic data: cut -> denoise ->
# noise pool -> kernel GAN -> fused factory -> SR train -> SR inference.
# Every stage is the same CLI a real run uses (see docs/MIGRATION.md);
# swap --input-dir for real calibrated scenes to reproduce the reference
# workflow. Runs on TPU when available, CPU otherwise.
set -euo pipefail

WORK="${1:-$(mktemp -d)}"
echo "working in $WORK"
cd "$WORK"

python - <<'EOF'
# synthesize a few calibrated "scenes" (5-band, NIR inside water range)
import numpy as np
from kmsr_tpu.io import write_band_stack, NCFile
import os
os.makedirs("scenes", exist_ok=True)
rng = np.random.default_rng(0)
for i in range(2):
    scene = rng.uniform(0.5, 5.0, size=(5, 160, 160)).astype(np.float32)
    scene[4] = 1.0  # NIR inside the [1e-6, 7.0] water-mask thresholds
    write_band_stack(f"scenes/s{i}.nc", "geophysical_data", scene, mode="w")
    with NCFile(f"scenes/s{i}.nc", "a") as f:
        lat = np.linspace(30, 31, 160 * 160).reshape(160, 160).astype(np.float32)
        f.create_variable("navigation_data", "latitude", lat, dims=("y", "x"))
        f.create_variable("navigation_data", "longitude", lat + 90, dims=("y", "x"))
print("scenes ready")
EOF

python -m kmsr_tpu.pipeline.cut --input-dir scenes --output-dir patches \
    --patch-size 64 --stride-ratio 0.5
python -m kmsr_tpu.pipeline.denoise_cli --batch patches --output denoised \
    --h-factor 1.0 --device-batch 8
python -m kmsr_tpu.pipeline.noise_pool_cli --input-dir denoised \
    --output-file pool.npy --patch-size 8 --samples-per-file 2 --seed 42
python -m kmsr_tpu.pipeline.train_single_kernel_cli --patch-dir denoised \
    --outdir gan_run --iters 100 --batch-size 8 --lr-crop-size 8 \
    --log-every 100 --kernel-log-every 100 --fast-forward
python -m kmsr_tpu.pipeline.factory --input-dir denoised \
    --kernel gan_run/kernel_per_band.npy --noise-pool pool.npy \
    --output-dir train_pairs --factor 8 --seed 42
python -m kmsr_tpu.pipeline.check_shapes --input-dir train_pairs --group lr --size 8
python -m kmsr_tpu.pipeline.train_sr_cli --train-dir train_pairs --outdir sr_run \
    --iters 100 --batch-size 4 --width 16 --n-blocks 2 --factor 8 --upsampler oneshot
python -m kmsr_tpu.pipeline.sr_infer --input-dir train_pairs \
    --model sr_run/sr_model.npz --output-dir sr_out --factor 8 \
    --width 16 --n-blocks 2 --upsampler oneshot
# whole-scene SR serving: tile + reassemble, equal to the untiled forward
python -m kmsr_tpu.pipeline.sr_scene --input scenes/s0.nc \
    --in-group geophysical_data --model sr_run/sr_model.npz \
    --output-dir sr_scenes --factor 8 --width 16 --n-blocks 2 \
    --upsampler oneshot --tile 64
python -m kmsr_tpu.analysis.log_analyzer gan_run/training_log.txt
# RGB quicklooks of the cut patches (parity: visualize_all_patches.py)
python -m kmsr_tpu.analysis.viz_cli rgb patches --output-dir patch_rgb

echo "done: SR patch outputs in $WORK/sr_out, scene SR in $WORK/sr_scenes"
