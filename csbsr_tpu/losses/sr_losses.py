"""SR losses: L1/L2 and the KBPN composite loss.

Functional rebuild of `/root/reference/model/utils/sr_loss_functions.py`.
The pseudo-LR per-sample conv loop (`:90-100`) is one grouped conv
(ops.blur.batch_blur) + the matmul bicubic downsample - fully fused on
device.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ..ops.blur import batch_blur
from ..ops.resize import resize
from .oriented import (
    crack_oriented_exp_weight,
    crack_oriented_weight,
    segment_failure_oriented_exp_weight,
    segment_failure_oriented_weight,
)


def l1_per_sample(pred, target):
    return jnp.mean(jnp.abs(pred - target), axis=(1, 2, 3))


def l2_per_sample(pred, target):
    return jnp.mean((pred - target) ** 2, axis=(1, 2, 3))


def get_pseudo_lr(sr, kernel_vec, ksize: int, scale_factor: int, method: str = "bicubic"):
    """Get_pseudo_lr (`sr_loss_functions.py:73-101`).

    kernel_vec: (B, k^2) (reference GAPs its expanded map first - identity
    for vectors); normalise to sum 1, depthwise-convolve the SR prediction,
    bicubic-downsample by 1/SF.  Returns (lr_pred, kernel_2d (B,k,k)).
    """
    vec = kernel_vec / jnp.sum(kernel_vec, axis=-1, keepdims=True)
    weight = vec.reshape(-1, ksize, ksize)
    blurred = batch_blur(sr, weight, stride=1)
    h, w = blurred.shape[1:3]
    lr = resize(blurred, (h // scale_factor, w // scale_factor), method=method)
    return lr, weight


def kbpn_loss(
    hr_pred,
    hr_target,
    lr_target,
    kernel_pred_vec,
    gt_kernel_2d,
    iteration,
    *,
    ksize: int,
    scale_factor: int,
    weights: Sequence[float] = (0.4, 0.4, 0.2),
    only_kernel_loss_in_window=None,
    segment_preds=None,
    segment_targets=None,
    co_amp: float = 0.0,
    sfo_amp: float = 0.0,
    co_bias: float = 1.0,
    sfo_bias: float = 1.0,
    weight_iter: int = -1,
    weight_variant: str = "exp",
    gaus_size: int = 7,
    gaus_sigma: float = 2.0,
    downscale_method: str = "bicubic",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KBPNLoss (`sr_loss_functions.py:17-71`).

    loss = w0*L1(HR) + w1*L1(pseudo-LR) + w2*MSE(kernel), optionally replaced
    by the kernel loss alone inside the kernel-pretrain window
    (`only_kernel_loss_in_window`: traced bool scalar or None).
    gt_kernel_2d: (B, k, k) (or (B, 1, k, k)/(B, k, k, 1), squeezed).
    Returns (per-sample loss (B,), kernel_pred_2d (B, k, k)).
    """
    if gt_kernel_2d.ndim == 4:
        gt_kernel_2d = gt_kernel_2d.reshape(gt_kernel_2d.shape[0], ksize, ksize)
    hr_map = jnp.abs(hr_pred - hr_target)
    lr_pred, kernel_2d = get_pseudo_lr(hr_pred, kernel_pred_vec, ksize, scale_factor, downscale_method)
    lr_map = jnp.abs(lr_pred - lr_target)
    kernel_map = (kernel_2d - gt_kernel_2d.astype(kernel_2d.dtype)) ** 2

    # oriented weights (sr_loss_functions.py:47-48,58-71); amps are static
    # config - the branches compile away when 0.
    if weight_iter != -1 and (co_amp != 0.0 or sfo_amp != 0.0):
        apply_w = iteration > weight_iter
        if co_amp != 0.0:
            if weight_variant == "linear":
                w_co = crack_oriented_weight(segment_targets, co_amp, co_bias,
                                             gaus_size, gaus_sigma)
            else:
                w_co = crack_oriented_exp_weight(segment_targets, co_amp)
            w_co_lr = resize(w_co, lr_map.shape[1:3], method="bilinear")
            hr_map = jnp.where(apply_w, w_co * hr_map, hr_map)
            lr_map = jnp.where(apply_w, w_co_lr * lr_map, lr_map)
        if sfo_amp != 0.0:
            if weight_variant == "linear":
                w_sfo = segment_failure_oriented_weight(
                    segment_preds, segment_targets, sfo_amp, sfo_bias,
                    gaus_size, gaus_sigma)
            else:
                w_sfo = segment_failure_oriented_exp_weight(segment_preds, segment_targets, sfo_amp)
            w_sfo_lr = resize(w_sfo, lr_map.shape[1:3], method="bilinear")
            hr_map = jnp.where(apply_w, w_sfo * hr_map, hr_map)
            lr_map = jnp.where(apply_w, w_sfo_lr * lr_map, lr_map)

    # The reference's default SR_LOSS_FUNC_SR_WEIGHT is the 4-element typo
    # `[0.4, 0.4, 0,2]` (`defaults.py:72` — comma, not decimal point): only
    # the first three entries are read (`sr_loss_functions.py:53-55`), so the
    # released recipes effectively train with KERNEL-MSE WEIGHT ZERO.  Mirror
    # the indexing so parity holds for both the typo'd and corrected lists.
    w0, w1, w2 = weights[0], weights[1], weights[2]
    loss = (
        w0 * jnp.mean(hr_map, axis=(1, 2, 3))
        + w1 * jnp.mean(lr_map, axis=(1, 2, 3))
        + w2 * jnp.mean(kernel_map, axis=(1, 2))
    )
    if only_kernel_loss_in_window is not None:
        loss = jnp.where(only_kernel_loss_in_window, jnp.mean(kernel_map, axis=(1, 2)), loss)
    return loss, kernel_2d
