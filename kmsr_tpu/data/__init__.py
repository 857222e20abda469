from .sampler import (
    PatchPool,
    StreamingPatchPool,
    NaNPatchError,
    gradient_weight_map,
    list_patch_files,
    load_scene_bands,
    sample_scene_patches,
    synthetic_pool,
)
