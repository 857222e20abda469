from .kernel_metrics import kernel_metrics, ascii_kernel, kernel_delta_l2
