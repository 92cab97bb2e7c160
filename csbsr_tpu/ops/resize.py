"""Resize as separable matrix multiplies.

TPU-first design: a 2-D resize is two small dense contractions
(H_out x H_in) @ x @ (W_in x W_out), which XLA maps straight onto the MXU and
fuses with neighbouring elementwise work.  The interpolation weights are
computed in numpy at trace time (shapes are static under jit), so parity with
the reference's torch resize semantics is exact and controllable:

- `bicubic`: Keys cubic with A=-0.75 (torch `F.interpolate(mode='bicubic')`,
  used by the reference at e.g. `model/modeling/kbpn.py:70` and
  `model/utils/sr_loss_functions.py:94` via FactorResize)
- `bilinear`: torch bilinear, both `align_corners` variants
  (`align_corners=True` paths: `pspnet.py:122`, `hrnet.py:142-157`)
- `area`: adaptive average pooling / area downsample
- `antialias`: widen the kernel by the downscale factor (matches
  torchvision `Resize(..., antialias=True)`); the reference's
  `F.interpolate` paths are antialias=False.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize", "resize_by_factor", "adaptive_avg_pool", "pixel_shuffle"]


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    x2 = x * x
    x3 = x2 * x
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x3 - (a + 3.0) * x2 + 1.0,
        np.where(x < 2.0, a * x3 - 5.0 * a * x2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _linear_kernel(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.clip(1.0 - x, 0.0, None)


_KERNELS = {
    "bicubic": (_cubic_kernel, 2.0),
    "bilinear": (_linear_kernel, 1.0),
}


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int,
    out_size: int,
    mode: str,
    align_corners: bool,
    antialias: bool,
) -> np.ndarray:
    """Dense (out_size, in_size) row-stochastic interpolation matrix."""
    if mode == "area":
        return _area_matrix(in_size, out_size)
    kernel_fn, support = _KERNELS[mode]
    if in_size == out_size and not antialias:
        return np.eye(out_size, dtype=np.float64)

    if align_corners and out_size > 1:
        scale = (in_size - 1) / (out_size - 1)
        centers = np.arange(out_size) * scale
    else:
        scale = in_size / out_size
        centers = (np.arange(out_size) + 0.5) * scale - 0.5

    downscale = max(scale, 1.0) if (antialias and not align_corners) else 1.0
    eff_support = support * downscale

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    left = np.floor(centers - eff_support).astype(np.int64) + 1
    n_taps = int(np.ceil(2 * eff_support)) + 1
    for t in range(n_taps):
        idx = left + t
        w = kernel_fn((idx - centers) / downscale) / downscale
        np.add.at(mat, (np.arange(out_size), np.clip(idx, 0, in_size - 1)), w)
    mat /= mat.sum(axis=1, keepdims=True)
    return mat


def _area_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Adaptive average pooling weights (torch AdaptiveAvgPool semantics)."""
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        start = int(np.floor(o * in_size / out_size))
        end = int(np.ceil((o + 1) * in_size / out_size))
        mat[o, start:end] = 1.0 / (end - start)
    return mat


def resize(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    method: str = "bicubic",
    align_corners: bool = False,
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize NHWC (or HWC / NHW1 / any rank>=3 with H,W at -3,-2) images."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out) and not antialias:
        return x
    # weight dtype follows the input: f64 inputs (reference-oracle parity
    # runs) keep full-precision weights, everything else computes in f32
    wdtype = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    wh = jnp.asarray(_resize_matrix(h_in, h_out, method, align_corners, antialias), dtype=wdtype)
    ww = jnp.asarray(_resize_matrix(w_in, w_out, method, align_corners, antialias), dtype=wdtype)
    orig_dtype = x.dtype
    xf = x.astype(wh.dtype)
    # HIGHEST precision: resize weights are parity-critical (PSNR window is
    # 0.5%); default TPU matmul precision is bf16 and costs ~3 decimal digits.
    out = jnp.einsum("oh,...hwc->...owc", wh, xf, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,...owc->...opc", ww, out, precision=jax.lax.Precision.HIGHEST)
    return out.astype(orig_dtype)


def resize_by_factor(
    x: jnp.ndarray,
    factor: float,
    method: str = "bicubic",
    align_corners: bool = False,
    antialias: bool = False,
) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    out_hw = (int(round(h * factor)), int(round(w * factor)))
    return resize(x, out_hw, method, align_corners, antialias)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d for NHWC. out_hw=(1,1) is a global mean."""
    if out_hw == (1, 1):
        return jnp.mean(x, axis=(-3, -2), keepdims=True)
    return resize(x, out_hw, method="area")


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch.nn.PixelShuffle on NHWC (channel-last) layout.

    Matches torch semantics: input channels laid out as (C_out, r, r).
    """
    b, h, w, c = x.shape
    r = factor
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, c_out
    return x.reshape(b, h * r, w * r, c_out)
