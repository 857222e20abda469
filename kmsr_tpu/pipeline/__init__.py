"""Pipeline stage runners (file-in/file-out contracts).

Stage order mirrors the reference's filename-prefix DAG (A_ -> C_ -> D_ -> E_):

  calibrate_landsat -> cut -> denoise -> noise_pool_cli
                                 \\-> train_single_kernel_cli (or dynamic/moe)
                                        -> apply_kernel -> make_train_data
  validation: check_shapes, inspect_nc, data_stats
"""
from .common import RunReport, run_per_file
