from .device_metrics import psnr, ssim, iou_thresholds, kernel_psnr
from .surface_distance import (
    compute_surface_distances,
    compute_robust_hausdorff,
    compute_average_surface_distance,
    calc_distance_metrics,
)
