from alg_tpu.alg.filters import apply_low_pass_filter, gaussian_kernel_1d
from alg_tpu.alg.matrices import (
    bilinear_resize_matrix,
    down_up_matrix,
    gaussian_blur_matrix,
    filter_matrices,
    apply_filter_matrices,
)
from alg_tpu.alg.schedule import (
    LPConfig,
    LPPlan,
    get_lp_strength,
    modulate_filter_params,
    build_lp_plan,
)

__all__ = [
    "apply_low_pass_filter",
    "gaussian_kernel_1d",
    "bilinear_resize_matrix",
    "down_up_matrix",
    "gaussian_blur_matrix",
    "filter_matrices",
    "apply_filter_matrices",
    "LPConfig",
    "LPPlan",
    "get_lp_strength",
    "modulate_filter_params",
    "build_lp_plan",
]
