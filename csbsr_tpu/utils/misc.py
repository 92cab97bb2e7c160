"""Misc utilities: chop_forward tiling, str2bool.

Rebuild of `/root/reference/model/utils/misc.py`.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"Boolean value expected, got {v}")


def chop_forward(x, forward_fn, scale: int, shave: int = 8, min_size: int = 80000):
    """Recursive quadrant tiling for large inputs (`misc.py:82-121`).

    x: (B, H, W, C) NHWC; forward_fn maps LR -> SR at `scale`.  Splits into 4
    overlapping quadrants (overlap `shave`), recursing until each tile is
    under `min_size` pixels, then stitches the shaved SR tiles.
    """
    b, h, w, c = x.shape
    h_half, w_half = h // 2, w // 2
    h_size, w_size = h_half + shave, w_half + shave
    inputs = [
        x[:, 0:h_size, 0:w_size],
        x[:, 0:h_size, (w - w_size):w],
        x[:, (h - h_size):h, 0:w_size],
        x[:, (h - h_size):h, (w - w_size):w],
    ]
    if w_size * h_size < min_size:
        outputs = [forward_fn(part) for part in inputs]
    else:
        outputs = [chop_forward(part, forward_fn, scale, shave, min_size) for part in inputs]

    h, w = scale * h, scale * w
    h_half, w_half = scale * h_half, scale * w_half
    h_size, w_size = scale * h_size, scale * w_size

    out = jnp.zeros((b, h, w, outputs[0].shape[-1]), outputs[0].dtype)
    out = out.at[:, 0:h_half, 0:w_half].set(outputs[0][:, 0:h_half, 0:w_half])
    out = out.at[:, 0:h_half, w_half:w].set(
        outputs[1][:, 0:h_half, (w_size - w + w_half):w_size]
    )
    out = out.at[:, h_half:h, 0:w_half].set(
        outputs[2][:, (h_size - h + h_half):h_size, 0:w_half]
    )
    out = out.at[:, h_half:h, w_half:w].set(
        outputs[3][:, (h_size - h + h_half):h_size, (w_size - w + w_half):w_size]
    )
    return out
