from .sampler import PatchPool, NaNPatchError, list_patch_files, synthetic_pool
