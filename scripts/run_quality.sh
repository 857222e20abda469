#!/usr/bin/env bash
# One-command reproduction of docs/QUALITY.md: synthetic Landsat-like
# scenes -> full pipeline DAG (cut/denoise/noise-pool/factory with the
# reference's shipped KernelGAN kernel) -> SR training with a held-out
# eval split -> quality report vs the bilinear baseline.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/make_quality_scenes.py quality_run/scenes --n 8 --size 896
python -m kmsr_tpu.pipeline.run_all --config configs/quality_x8.json --resume
python scripts/quality_report.py \
    --pairs quality_run/work/train_pairs \
    --sr quality_run/work/sr_run \
    --holdout 24 --width 64 --n-blocks 8 --out docs/QUALITY.md
