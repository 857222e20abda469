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
