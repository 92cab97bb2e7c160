"""Output savers: prediction images, per-threshold masks, kernels.

Rebuild of `/root/reference/model/utils/save_output.py:16-70`.
Arrays are NHWC float in [0,1].
"""
from __future__ import annotations

import os
from typing import List

import numpy as np


def _to_pil(arr: np.ndarray):
    from PIL import Image

    arr = np.clip(arr, 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    mode = "L" if arr.ndim == 2 else "RGB"
    return Image.fromarray((arr * 255).round().astype(np.uint8), mode=mode)


def save_img(output_dir: str, imgs: np.ndarray, fnames: List[str]):
    d = os.path.join(output_dir, "images")
    os.makedirs(d, exist_ok=True)
    for img, fname in zip(np.asarray(imgs), fnames):
        _to_pil(img).save(os.path.join(d, fname))


def save_mask(output_dir: str, masks: np.ndarray, fnames: List[str], threshold: float):
    sub = "raw" if threshold < 0 else f"th_{threshold:.2f}"
    d = os.path.join(output_dir, "masks", sub)
    os.makedirs(d, exist_ok=True)
    for mask, fname in zip(np.asarray(masks), fnames):
        _to_pil(mask).save(os.path.join(d, fname.replace(".jpg", ".png")))


def save_kernel(output_dir: str, kernels: np.ndarray, fnames: List[str]):
    """Max- and sum-normalised kernel dumps (`save_output.py:43-70`)."""
    for sub, norm in (("kernels_max", "max"), ("kernels_sum", "sum")):
        d = os.path.join(output_dir, sub)
        os.makedirs(d, exist_ok=True)
        for k, fname in zip(np.asarray(kernels), fnames):
            k = k.astype(np.float64)
            if norm == "max":
                k = k / max(k.max(), 1e-12)
            else:
                k = k / max(k.sum(), 1e-12)
                k = np.clip(k * 50, 0, 1)
            _to_pil(k[..., None]).save(os.path.join(d, fname.replace(".jpg", ".png")))
