from .cache import enable_persistent_cache
from .params_io import save_params, load_params
from .torch_import import load_moe_torch_checkpoint
