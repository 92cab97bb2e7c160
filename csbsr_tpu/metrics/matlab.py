"""BasicSR-style standalone metrics: Matlab-parity PSNR/SSIM + imresize.

Rebuild of `/root/reference/model/utils/metrics/{psnr_ssim,matlab_functions,
metrics_util}.py` (the folder-compare evaluation utilities): Y-channel
PSNR/SSIM with border cropping, and Matlab's `imresize` (cubic A=-0.5,
antialiased on downscale) - numpy host-side, as in the reference.
"""
from __future__ import annotations

import math

import numpy as np


def _matlab_cubic(x):
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2
    ) * ((ax > 1) & (ax <= 2))


def _resize_weights(in_len, out_len, scale, antialias=True):
    kernel_width = 4.0
    if scale < 1 and antialias:
        kernel_width /= scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(p)[None, :] - 1  # 0-based candidate idx
    dist = u[:, None] - (ind + 1)
    if scale < 1 and antialias:
        w = scale * _matlab_cubic(dist * scale)
    else:
        w = _matlab_cubic(dist)
    w = w / np.sum(w, axis=1, keepdims=True)
    # clamp out-of-range indices (replicate border)
    ind = np.clip(ind, 0, in_len - 1).astype(np.int64)
    # drop all-zero weight columns
    keep = ~np.all(w == 0, axis=0)
    return w[:, keep], ind[:, keep]


def imresize(img: np.ndarray, scale: float, antialias: bool = True) -> np.ndarray:
    """Matlab imresize (bicubic) for HxW or HxWxC float arrays."""
    img = np.asarray(img, np.float64)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w = img.shape[:2]
    oh, ow = int(math.ceil(h * scale)), int(math.ceil(w * scale))
    wh, ih = _resize_weights(h, oh, scale, antialias)
    out = np.einsum("ok,okwc->owc", wh, img[ih, :, :])
    ww, iw = _resize_weights(w, ow, scale, antialias)
    out = np.einsum("ok,hokc->hoc", ww, out[:, iw, :])
    return out[:, :, 0] if squeeze else out


def rgb2ycbcr(img: np.ndarray, y_only: bool = True) -> np.ndarray:
    """ITU-R BT.601 (Matlab rgb2ycbcr). img: float in [0,1] HxWx3."""
    if y_only:
        return img @ np.array([65.481, 128.553, 24.966]) / 255.0 + 16.0 / 255.0
    mat = np.array(
        [[65.481, -37.797, 112.0], [128.553, -74.203, -93.786], [24.966, 112.0, -18.214]]
    )
    return img @ mat / 255.0 + np.array([16.0, 128.0, 128.0]) / 255.0


def _prep(img, crop_border, test_y_channel):
    img = np.asarray(img, np.float64)
    if img.max() > 1.5:
        img = img / 255.0
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel and img.ndim == 3 and img.shape[2] == 3:
        img = rgb2ycbcr(img, y_only=True)
    return img * 255.0


def calculate_psnr(img1, img2, crop_border: int = 0, test_y_channel: bool = False) -> float:
    """psnr_ssim.calculate_psnr parity: on [0,255], optional Y channel."""
    a = _prep(img1, crop_border, test_y_channel)
    b = _prep(img2, crop_border, test_y_channel)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(a, b):
    """SSIM on one channel with the 11x11 sigma-1.5 Gaussian, valid region
    (Matlab/BasicSR convention)."""
    from scipy.ndimage import correlate

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5**2))
    g = np.outer(g, g)
    g /= g.sum()

    def f(x):
        return correlate(x, g, mode="constant")[5:-5, 5:-5]

    mu1, mu2 = f(a), f(b)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = f(a * a) - mu1_sq
    s2 = f(b * b) - mu2_sq
    s12 = f(a * b) - mu12
    smap = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return smap.mean()


def calculate_ssim(img1, img2, crop_border: int = 0, test_y_channel: bool = False) -> float:
    a = _prep(img1, crop_border, test_y_channel)
    b = _prep(img2, crop_border, test_y_channel)
    if a.ndim == 2:
        return float(_ssim_single(a, b))
    return float(np.mean([_ssim_single(a[..., c], b[..., c]) for c in range(a.shape[2])]))
