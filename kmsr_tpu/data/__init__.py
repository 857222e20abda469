from .sampler import (
    PatchPool,
    StreamingPatchPool,
    NaNPatchError,
    list_patch_files,
    synthetic_pool,
)
