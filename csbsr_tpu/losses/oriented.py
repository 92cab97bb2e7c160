"""Crack/failure-oriented loss weights (w^f).

Functional rebuild of `/root/reference/model/utils/oriented_weight.py`.
The crack-oriented SDM runs on device (ops.edt) instead of scipy-on-CPU
(`oriented_weight.py:55-56`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.edt import edt


def crack_oriented_exp_weight(gt, amp: float, _lambda: float = 2.0):
    """CrackOrientedExpWeight (`oriented_weight.py:46-58`):
    lambda * exp(-amp * SDM(gt)) with SDM = unnormalised distance-to-crack
    (compute_sdm, `oriented_weight.py:92-119`; empty masks -> zeros).
    gt: (B, H, W, 1) binary. Returns (B, H, W, 1).
    """
    mask = gt[..., 0] > 0.5  # (B, H, W)
    dist = edt(mask)  # distance to nearest crack pixel (negdis)
    dist = jnp.where(jnp.any(mask, axis=(1, 2), keepdims=True), dist, 0.0)
    w = jnp.exp(-amp * dist)[..., None]
    return _lambda * jax.lax.stop_gradient(w)


def segment_failure_oriented_exp_weight(pred, gt, amp: float, _lambda: float = 1.0):
    """SegmentFailerOrientedExpWeight (`oriented_weight.py:73-83`):
    lambda * exp(amp * |stop_grad(pred) - gt|)."""
    w = jnp.exp(amp * jnp.abs(jax.lax.stop_gradient(pred) - gt))
    return _lambda * w


def oriented_gaussian_map(size: int, sigma: float) -> jnp.ndarray:
    """MetaWeight's Gaussian (`oriented_weight.py:26-33`): isotropic
    GaussianBlur(sigma=ORIENTED_WEIGHT_GAUS, k=BLUR.KERNEL_SIZE), sum-1
    normalised then rescaled to max 1. Deterministic (theta is irrelevant
    for the isotropic case)."""
    r = size // 2
    g = jnp.linspace(-r, r, size)
    k = jnp.exp(-(g[None, :] ** 2 + g[:, None] ** 2) / (2.0 * sigma**2))
    k = k / jnp.sum(k)
    return k / jnp.max(k)


def _same_conv_single(x, kernel_2d):
    """(B, H, W, 1) same-padding conv with one shared 2-D kernel."""
    k = kernel_2d.shape[-1]
    pad = (k - 1) // 2
    w = kernel_2d[:, :, None, None].astype(x.dtype)  # HWIO
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def crack_oriented_weight(gt, amp: float, bias: float, size: int = 7, sigma: float = 2.0):
    """CrackOrientedWeight (`oriented_weight.py:36-44`, the linear
    Gaussian-conv variant, present in the reference as the commented-out
    alternative of `sr_loss_functions.py:35-38`):
    amp * conv(gt, gaussian_max1) + bias. gt: (B, H, W, 1)."""
    g = oriented_gaussian_map(size, sigma)
    w = amp * _same_conv_single(gt, g) + bias
    return jax.lax.stop_gradient(w)


def segment_failure_oriented_weight(pred, gt, amp: float, bias: float,
                                    size: int = 7, sigma: float = 2.0):
    """SegmentFailerOrientedWeight (`oriented_weight.py:61-70`):
    amp * conv(|stop_grad(pred) - gt|, gaussian_max1) + bias."""
    g = oriented_gaussian_map(size, sigma)
    diff = jnp.abs(jax.lax.stop_gradient(pred) - gt)
    return amp * _same_conv_single(diff, g) + bias
