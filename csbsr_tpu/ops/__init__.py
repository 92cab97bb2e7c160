from .resize import resize, resize_by_factor, adaptive_avg_pool, pixel_shuffle
from .edt import edt, signed_distance_map, sdf_normalized, find_boundaries_inner
from .blur import (
    gaussian_kernels,
    disk_kernels,
    motion_kernels,
    kernel_compound,
    batch_blur,
    degrade,
    identity_kernels,
)
from .patch import split_patch, joint_patch

__all__ = [
    "resize",
    "resize_by_factor",
    "adaptive_avg_pool",
    "pixel_shuffle",
    "edt",
    "signed_distance_map",
    "sdf_normalized",
    "find_boundaries_inner",
    "gaussian_kernels",
    "disk_kernels",
    "motion_kernels",
    "kernel_compound",
    "batch_blur",
    "degrade",
    "identity_kernels",
    "split_patch",
    "joint_patch",
]
