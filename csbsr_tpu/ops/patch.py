"""Patch split/join as pure reshape/transpose ops.

Reference: `SplitPatch` / `JointPatch`
(`/root/reference/model/data/samplers/patch_sampler.py:15-51`) unfold a CHW
image into non-overlapping patches plus a 7-int shape vector
[B, splitC, splitH, splitW, patchC, patchH, patchW], and invert it.  On TPU
these are zero-FLOP layout ops; the patch axis becomes a batch axis that
`pjit` shards across the mesh (the reference's "patch parallelism",
SURVEY.md 2.9).

We keep the same 7-int shape-vector convention for CLI/engine parity but
operate on NHWC arrays.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["split_patch", "joint_patch"]


def split_patch(img: jnp.ndarray, patch_h: int, patch_w: int):
    """Split (H, W, C) into (num_patches, patch_h, patch_w, C).

    H, W must be multiples of the patch size (the reference's unfold silently
    drops remainders; test images are sized to full multiples).
    Returns (patches, unfold_shape) with the reference's 7-int vector
    [1, 1, nH, nW, C, patch_h, patch_w].
    """
    h, w, c = img.shape
    nh, nw = h // patch_h, w // patch_w
    if nh == 0 or nw == 0:
        raise ValueError(
            f"image {h}x{w} is smaller than the patch {patch_h}x{patch_w}; "
            f"set INPUT.IMAGE_SIZE <= scale_factor * image size"
        )
    x = img[: nh * patch_h, : nw * patch_w]
    x = x.reshape(nh, patch_h, nw, patch_w, c)
    x = x.transpose(0, 2, 1, 3, 4)  # nh, nw, ph, pw, c
    patches = x.reshape(nh * nw, patch_h, patch_w, c)
    unfold_shape = np.array([1, 1, nh, nw, c, patch_h, patch_w], dtype=np.int64)
    return patches, unfold_shape


def joint_patch(patches: jnp.ndarray, unfold_shape) -> jnp.ndarray:
    """Inverse of split_patch for a batch of images' patches.

    patches: (B * nH * nW, ph, pw, C); unfold_shape as produced by
    split_patch (patch H/W entries may have been scaled by the SR factor,
    mirroring `inference.py:89-90`).
    Returns (B, nH*ph, nW*pw, C).
    """
    _, _, nh, nw, c, ph, pw = [int(v) for v in unfold_shape]
    x = patches.reshape(-1, nh, nw, ph, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, nh, ph, nw, pw, c
    return x.reshape(-1, nh * ph, nw * pw, c)
