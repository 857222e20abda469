from .params_io import save_params, load_params
