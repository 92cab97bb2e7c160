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
