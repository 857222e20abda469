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

# Pallas-backed ops are exported lazily: importing jax.experimental.pallas
# (+ pallas.tpu) at package import would tax every XLA-only consumer (the
# pipeline/parallel modules deliberately keep their Pallas imports
# function-local for the same reason). Functions whose name EQUALS their
# submodule (`degrade_pallas`) are deliberately
# not re-exported here — the submodule attribute set by any prior import
# would shadow them; import those directly, e.g.
# `from kmsr_tpu.ops.degrade_pallas import degrade_pallas`.
_PALLAS_EXPORTS = {
    "degrade_pallas_chwb": "degrade_pallas",
    "degrade_pallas_presplit": "degrade_pallas",
    "phase_split_chwb": "degrade_pallas",
}


def __getattr__(name):
    if name in _PALLAS_EXPORTS:
        import importlib

        mod = importlib.import_module(
            f".{_PALLAS_EXPORTS[name]}", __package__
        )
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

# The fastest fused degrade path (bench.py and apply_kernel use this
# alias). Measured on v5e at batch 8192: the strided-conv XLA path wins
# (~825-948k patches/s) over the Pallas batch-in-lanes kernel (~672k);
# `degrade_pallas` remains the fused-noise option.
degrade_fused = degrade_strided
