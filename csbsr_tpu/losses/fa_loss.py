"""Feature-affinity loss (DSRL).

Rebuild of `/root/reference/model/modeling/DSRL/utils/fa_loss.py:5-30`:
average-pool both feature maps by 1/subscale, form Gram matrices over
spatial positions, L1 distance, normalised by (h*w)^2.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.resize import adaptive_avg_pool


def fa_loss(feature1: jnp.ndarray, feature2: jnp.ndarray, subscale: float = 0.0625):
    """feature1/2: (B, H, W, C) NHWC. Returns scalar."""
    s = int(1 / subscale)
    f1 = adaptive_avg_pool(feature1, (feature1.shape[1] // s, feature1.shape[2] // s))
    f2 = adaptive_avg_pool(feature2, (feature2.shape[1] // s, feature2.shape[2] // s))
    b, h, w, c = f1.shape
    f1 = f1.reshape(b, h * w, c)
    f2 = f2.reshape(b, f2.shape[1] * f2.shape[2], f2.shape[3])
    mat1 = jnp.einsum("bpc,bqc->bpq", f1, f1)
    mat2 = jnp.einsum("bpc,bqc->bpq", f2, f2)
    l1 = jnp.sum(jnp.abs(mat2 - mat1))
    return l1 / float((h * w) ** 2)
