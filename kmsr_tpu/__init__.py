"""kmsr_tpu — TPU-native kernel-modeling super-resolution framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
"Kernel-Modeling-Super-Resolution" pipeline (blind degradation-kernel
estimation via unpaired GANs, empirical noise modeling, and an SR
train-data factory for satellite ocean-color imagery), built for TPU:
fused Pallas degrade kernels, vmapped band/sample parallelism, pjit-sharded
training steps over device meshes, and orbax checkpointing.
"""

__version__ = "0.1.0"
