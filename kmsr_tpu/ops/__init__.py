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

# The fastest fused degrade path; re-pointed at the Pallas kernel on TPU
# once `degrade_pallas` lands (bench.py and apply_kernel use this alias).
degrade_fused = degrade_strided
