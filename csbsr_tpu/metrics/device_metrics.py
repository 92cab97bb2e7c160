"""On-device metrics: PSNR, SSIM, IoU over threshold banks.

Rebuild of `/root/reference/model/utils/estimate_metrics.py` on NHWC jax
arrays, computed on device (the reference moves tensors to CPU/numpy inside
the eval loop, `estimate_metrics.py:75-78,100,191`).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR on [0,1] images: 10*log10(1/MSE) per sample (estimate_metrics.py:89-101)."""
    mse = jnp.mean((img1 - img2) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / mse)


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / float(2 * sigma**2)) for x in range(window_size)]
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM, 11x11 Gaussian sigma=1.5, zero padding, per-sample mean
    (estimate_metrics.py:134-201). img*: (B, H, W, C)."""
    c = img1.shape[-1]
    w2d = _gaussian_window(window_size, 1.5)
    kernel = jnp.asarray(w2d)[:, :, None, None]  # (k,k,1,1)
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # depthwise (k,k,1,C)
    pad = window_size // 2

    def conv(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def iou_thresholds(output: jnp.ndarray, target: jnp.ndarray, thresholds: jnp.ndarray) -> jnp.ndarray:
    """IoU at a bank of thresholds in one broadcasted op.

    Mirrors `estimate_metrics.py:64-84` + the threshold binarisation at
    `inference.py:111`: output > th (target > 0.5), smooth 1e-5.
    output/target: (B, H, W, 1); thresholds: (T,). Returns (B, T).
    """
    smooth = 1e-5
    o = output[:, None, :, :, 0]  # (B, 1, H, W)
    t = target[:, None, :, :, 0] > 0.5
    ob = o > thresholds[None, :, None, None]
    inter = jnp.sum(ob & t, axis=(2, 3))
    union = jnp.sum(ob | t, axis=(2, 3))
    return (inter + smooth) / (union + smooth)


def kernel_psnr(kernel_pred: jnp.ndarray, kernel_gt: jnp.ndarray) -> jnp.ndarray:
    """PSNR between max-normalised kernels (trainer.py eval convention:
    kernels rescaled to [0,1] by their max before PSNR)."""
    kp = kernel_pred / jnp.clip(jnp.max(kernel_pred, axis=(-2, -1), keepdims=True), 1e-12, None)
    kg = kernel_gt / jnp.clip(jnp.max(kernel_gt, axis=(-2, -1), keepdims=True), 1e-12, None)
    mse = jnp.mean((kp - kg) ** 2, axis=(-2, -1))
    return 10.0 * jnp.log10(1.0 / mse)


def hausdorff_distance(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Symmetric Hausdorff distance on binary masks, on device.

    Rebuild of the reference's EDT-based HausdorffDistance
    (`estimate_metrics.py:205-232`, dormant there): the directed distance
    hd(x, y) = max over nonzero(x) of EDT-to-nonzero(y); the result is the
    max of both directions, Inf when either mask is empty.
    pred/target: (B, H, W) or (B, H, W, 1) bool/0-1. Returns (B,) float32.
    """
    from ..ops.edt import edt

    if pred.ndim == 4:
        pred = pred[..., 0]
    if target.ndim == 4:
        target = target[..., 0]
    p = pred > 0.5
    t = target > 0.5

    def directed(x, y):
        d = edt(y)  # distance to nearest True of y
        m = jnp.max(jnp.where(x, d, -jnp.inf), axis=(-2, -1))
        empty = ~jnp.any(x, axis=(-2, -1)) | ~jnp.any(y, axis=(-2, -1))
        return jnp.where(empty, jnp.inf, m)

    return jnp.maximum(directed(p, t), directed(t, p)).astype(jnp.float32)
