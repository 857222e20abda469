from .degrade import (
    degrade,
    degrade_strided,
    degrade_batch_kernels,
    normalize_kernel,
    block_mean,
    avg_pool2,
    replicate_pad,
    depthwise_conv2d,
    compose_with_box,
)
from .kernel_algebra import compose_chain, compose_pair, effective_kernel, full_conv2d
from .degrade_pallas import (
    degrade_pallas,
    degrade_pallas_chwb,
    degrade_pallas_presplit,
    phase_split_chwb,
)
from .degrade_scene_tiles import degrade_scene_tiles, scene_to_tiles_ext

# The fastest fused degrade path (bench.py and apply_kernel use this
# alias). Measured on v5e at batch 8192: the strided-conv XLA path wins
# (~825-948k patches/s) over the Pallas batch-in-lanes kernel (~672k);
# `degrade_pallas` remains the fused-noise option.
degrade_fused = degrade_strided
