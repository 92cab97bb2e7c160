"""Blur-kernel synthesis and the fused on-device degradation op.

The reference synthesises one kernel per sample on the dataloader worker,
round-tripping through CUDA (`/root/reference/model/data/crack_dataset.py:51-54`,
`model/data/blur/blur.py:121-238`).  Here kernel synthesis is a vectorised
JAX function of an rng key (whole batch at once) and the degradation
(depthwise blur conv + bicubic /SF downsample) is a single jit region that
fuses into the training step - no host round-trip, no per-sample Python loop.

Kernel families mirror `blur.py`:
  - `gaussian_kernels`: anisotropic Gaussian, theta ~ U[0,180) deg,
    sigma_{x,y} ~ U[a,b] (`blur.py:121-179`)
  - `disk_kernels`: filled circle of random radius (`blur.py:99-118`)
  - `motion_kernels`: rotated line (`blur.py:49-96`)
  - `kernel_compound`: 2-D convolution of two kernels (`blur.py:202-205`)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resize import resize

__all__ = [
    "gaussian_kernels",
    "disk_kernels",
    "disk_kernel_from",
    "motion_kernels",
    "motion_kernel_from",
    "kernel_compound",
    "make_kernel_sampler",
    "batch_blur",
    "degrade",
    "identity_kernels",
]


def _grid(size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Horizontal/vertical coordinate grids as in blur.py:132-137."""
    radius = int(size / 2)
    rng = jnp.linspace(-radius, radius, size)
    horizontal = jnp.tile(rng[None, :], (size, 1))
    vertical = jnp.tile(rng[:, None], (1, size))
    return horizontal, vertical


def gaussian_kernels(
    key: jax.Array,
    batch: int,
    size: int = 21,
    sigma_range: Tuple[float, float] = (0.2, 4.0),
    sigma_range2: Tuple[float, float] | None = None,
    theta_range_deg: Tuple[float, float] = (0.0, 180.0),
    isotropic: bool = False,
) -> jnp.ndarray:
    """Batch of anisotropic Gaussian kernels, each normalised to sum 1.

    Vectorised port of `GaussianBlur.make` (`blur.py:128-168`).
    Returns (batch, size, size) float32.
    """
    k_theta, k_s1, k_s2 = jax.random.split(key, 3)
    t0, t1 = theta_range_deg
    theta = (jax.random.uniform(k_theta, (batch,)) * (t1 - t0) + t0) * jnp.pi / 180.0
    a0, b0 = sigma_range
    sigma_x = jax.random.uniform(k_s1, (batch,)) * (b0 - a0) + a0
    if isotropic:
        sigma_y = sigma_x
    else:
        a1, b1 = sigma_range2 if sigma_range2 is not None else sigma_range
        sigma_y = jax.random.uniform(k_s2, (batch,)) * (b1 - a1) + a1

    h, v = _grid(size)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    sx2 = 2.0 * sigma_x**2
    sy2 = 2.0 * sigma_y**2
    a = (cos_t**2 / sx2 + sin_t**2 / sy2)[:, None, None]
    b = (sin_t * cos_t * (1.0 / sy2 - 1.0 / sx2))[:, None, None]
    c = (sin_t**2 / sx2 + cos_t**2 / sy2)[:, None, None]
    kern = jnp.exp(-(a * h**2 + 2.0 * b * h * v + c * v**2))
    return kern / jnp.sum(kern, axis=(1, 2), keepdims=True)


def disk_kernel_from(det, size: int = 21) -> jnp.ndarray:
    """Deterministic disk kernel from integer deterioration values.

    `DiskBlur.make` (blur.py:103-118): radius = det/2 + 0.5, pixel (r,c)
    included iff (r-cc)^2 + (c-cc)^2 < radius^2 with cc = int(size/2) (the
    skimage.draw.disk strict-interior rasterisation).  det: (batch,).
    """
    det = jnp.maximum(jnp.asarray(det, jnp.float32), 1.0)
    radius = det / 2.0 + 0.5
    cc = int(size / 2)
    r = jnp.arange(size, dtype=jnp.float32)
    d2 = (r[:, None] - cc) ** 2 + (r[None, :] - cc) ** 2
    kern = (d2[None] < radius[:, None, None] ** 2).astype(jnp.float32)
    return kern / jnp.sum(kern, axis=(1, 2), keepdims=True)


def disk_kernels(
    key: jax.Array,
    batch: int,
    size: int = 21,
    ratio_range: Tuple[float, float] = (0.1, 1.0),
) -> jnp.ndarray:
    """Filled-circle kernels (`DiskBlur.make`, blur.py:103-118):
    det = round(size * U[a,b]) (min 1), kernel = disk_kernel_from(det)."""
    a, b = ratio_range
    det = jnp.round(size * (jax.random.uniform(key, (batch,)) * (b - a) + a))
    return disk_kernel_from(det, size)


def _motion_bases(size: int) -> jnp.ndarray:
    """The four quadrant base kernels of `MotionBlur.make` (blur.py:66-75):
    [0,45): centre row; [45,90): anti-diagonal; [90,135): centre column;
    [135,180): main diagonal."""
    import numpy as np

    c = int((size - 1) / 2)
    b0 = np.zeros((size, size), np.float32)
    b0[c, :] = 1.0
    b1 = np.eye(size, dtype=np.float32)[::-1].copy()
    b2 = np.zeros((size, size), np.float32)
    b2[:, c] = 1.0
    b3 = np.eye(size, dtype=np.float32)
    return jnp.asarray(np.stack([b0, b1, b2, b3]))


def motion_kernel_from(deg, length, size: int = 21) -> jnp.ndarray:
    """Deterministic motion kernel from angle (degrees, [0,180)) and odd
    line length — the exact `MotionBlur.make` algorithm (blur.py:53-87):

    1. pick the quadrant base kernel, residual angle = deg - 45*quadrant;
    2. rotate it about the pixel centre ((size-1)/2, (size-1)/2) by the
       residual angle CCW — cv2.getRotationMatrix2D + warpAffine
       INTER_LINEAR, reproduced as inverse-map bilinear sampling with
       zero border (exact float arithmetic; cv2's 1/32-fixed-point
       coordinate quantisation is not reproduced);
    3. zero everything outside the central length x length square
       (margin = (size-length)/2, integral since both are odd);
    4. normalise to sum 1.

    deg, length: (batch,) arrays.  Returns (batch, size, size) float32.
    """
    deg = jnp.asarray(deg, jnp.float32)
    length = jnp.asarray(length, jnp.float32)
    batch = deg.shape[0]
    bases = _motion_bases(size)
    q = jnp.clip(jnp.floor(deg / 45.0), 0.0, 3.0).astype(jnp.int32)
    residual = (deg - 45.0 * q) * jnp.pi / 180.0
    base = jnp.take(bases, q, axis=0)  # (batch, size, size)

    c = (size - 1) / 2.0
    coord = jnp.arange(size, dtype=jnp.float32)
    x = jnp.tile(coord[None, :], (size, 1))[None]  # (1, size, size)
    y = jnp.tile(coord[:, None], (1, size))[None]
    alpha = jnp.cos(residual)[:, None, None]
    beta = jnp.sin(residual)[:, None, None]
    # warpAffine inverse map: src = R(-residual) @ (dst - c) + c in image
    # coords (y down), matching getRotationMatrix2D's CCW convention
    sx = alpha * (x - c) - beta * (y - c) + c
    sy = beta * (x - c) + alpha * (y - c) + c
    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    fx, fy = sx - x0, sy - y0

    flat = base.reshape(batch, size * size)

    def gather(yy, xx):
        inb = (yy >= 0) & (yy < size) & (xx >= 0) & (xx < size)
        yyc = jnp.clip(yy, 0, size - 1).astype(jnp.int32)
        xxc = jnp.clip(xx, 0, size - 1).astype(jnp.int32)
        idx = (yyc * size + xxc).reshape(batch, -1)
        v = jnp.take_along_axis(flat, idx, axis=1).reshape(batch, size, size)
        return v * inb.astype(v.dtype)

    rot = (
        gather(y0, x0) * (1 - fx) * (1 - fy)
        + gather(y0, x0 + 1) * fx * (1 - fy)
        + gather(y0 + 1, x0) * (1 - fx) * fy
        + gather(y0 + 1, x0 + 1) * fx * fy
    )
    # central length x length crop (blur.py:81-83)
    margin = jnp.round((size - length) / 2.0)[:, None]
    r = coord[None, :]
    in_span = (r >= margin) & (r < margin + length[:, None])
    mask = in_span[:, :, None] & in_span[:, None, :]
    kern = rot * mask.astype(rot.dtype)
    return kern / jnp.sum(kern, axis=(1, 2), keepdims=True)


def motion_kernels(
    key: jax.Array,
    batch: int,
    size: int = 21,
    ratio_range: Tuple[float, float] = (0.1, 1.0),
) -> jnp.ndarray:
    """Rotated-line motion kernels (`MotionBlur.make`, blur.py:53-96):
    deg ~ 180*U[0,1), length = even2odd(round(size*U[a,b]), random +-1),
    kernel = motion_kernel_from(deg, length)."""
    k_deg, k_len, k_parity = jax.random.split(key, 3)
    deg = 180.0 * jax.random.uniform(k_deg, (batch,))
    a, b = ratio_range
    det = jnp.round(size * (jax.random.uniform(k_len, (batch,)) * (b - a) + a))
    det = jnp.maximum(det, 1.0)
    # even -> odd (randomly +-1), blur.py:89-96
    is_even = jnp.mod(det, 2.0) == 0.0
    bump = jnp.where(jax.random.bernoulli(k_parity, 0.5, (batch,)), -1.0, 1.0)
    length = jnp.where(is_even, det + bump, det)
    length = jnp.clip(length, 1.0, size if size % 2 == 1 else size - 1)
    return motion_kernel_from(deg, length, size)


def kernel_compound(kernel_a: jnp.ndarray, kernel_b: jnp.ndarray) -> jnp.ndarray:
    """Convolve two batched kernels, renormalise (`blur.py:202-205`)."""
    b, k, _ = kernel_a.shape
    pad = (kernel_b.shape[-1] - 1) // 2
    lhs = kernel_a[:, :, :, None]  # NHWC with C=1
    rhs = kernel_b[:, :, :, None, None]  # (B,k,k,1,1)
    out = jax.vmap(
        lambda x, w: jax.lax.conv_general_dilated(
            x[None], w, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]
    )(lhs, rhs)
    out = out[..., 0]
    return out / jnp.sum(out, axis=(1, 2), keepdims=True)


def make_kernel_sampler(
    mode: str = "gaus",
    size: int = 21,
    sigma_range: Tuple[float, float] = (0.2, 4.0),
    sigma_range2: Tuple[float, float] | None = None,
    ratio_range: Tuple[float, float] = (0.1, 1.0),
    isotropic: bool = False,
):
    """Blur-mode dispatcher mirroring `set_blur` (`blur.py:207-238`):
    mode in {"gaus", "disk", "motion", "all_rand", "<ker1>-<ker2>"}.

    Returns a jit-stable `sample(key, batch) -> (batch, size, size)` kernels
    function.  "all_rand" = motion ∘ (gaus or disk), chosen per SAMPLE here
    (the reference chooses per __getitem__ call, i.e. per sample too —
    `np.random.randint(2)` at `blur.py:225`); "<a>-<b>" composes two named
    families with `kernel_compound`.
    """
    families = {
        "gaus": lambda key, b: gaussian_kernels(
            key, b, size, sigma_range, sigma_range2, isotropic=isotropic),
        "disk": lambda key, b: disk_kernels(key, b, size, ratio_range),
        "motion": lambda key, b: motion_kernels(key, b, size, ratio_range),
    }
    if mode in families:
        return families[mode]
    if mode == "all_rand":
        def sample(key, b):
            k_sel, k_m, k_g, k_d = jax.random.split(key, 4)
            misc = jnp.where(
                jax.random.bernoulli(k_sel, 0.5, (b,))[:, None, None],
                families["gaus"](k_g, b),
                families["disk"](k_d, b),
            )
            return kernel_compound(families["motion"](k_m, b), misc)
        return sample
    if "-" in mode:
        name_a, name_b = mode.split("-")
        fam_a, fam_b = families[name_a], families[name_b]
        def sample(key, b):
            k_a, k_b = jax.random.split(key)
            return kernel_compound(fam_a(k_a, b), fam_b(k_b, b))
        return sample
    raise ValueError(f"unknown blur mode {mode!r}")


def identity_kernels(batch: int, size: int) -> jnp.ndarray:
    """Delta kernels for BLUR.FLAG=False (`crack_dataset.py:56-58`)."""
    k = jnp.zeros((batch, size, size), jnp.float32)
    return k.at[:, size // 2, size // 2].set(1.0)


def batch_blur(images: jnp.ndarray, kernels: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Per-sample depthwise blur: one fused op for the whole batch.

    Replaces the reference's per-sample Python loop
    (`kbpn.py:395-402`, `sr_loss_functions.py:90-100`, `blur.py:182-200`).
    stride > 1 (the KBlock pseudo-LR path) uses a space-to-depth shift-einsum
    (no grouped conv: TPU handles B*C-group convolutions poorly); stride == 1
    uses one grouped convolution.

    images: (B, H, W, C); kernels: (B, k, k). Returns (B, H', W', C) with
    H' = floor((H + 2p - k)/stride) + 1, p = (k-1)//2 (torch F.conv2d parity).
    """
    if stride > 1:
        return _batch_blur_s2d(images, kernels, stride)
    b, h, w, c = images.shape
    k = kernels.shape[-1]
    pad = (k - 1) // 2
    x = jnp.transpose(images, (1, 2, 0, 3)).reshape(1, h, w, b * c)
    # torch F.conv2d cross-correlates; lax.conv_general_dilated does too.
    wgt = jnp.repeat(kernels[:, None], c, axis=1)  # (B, C, k, k)
    wgt = wgt.reshape(b * c, k, k)  # b-major, matching the input layout
    wgt = jnp.transpose(wgt[..., None], (1, 2, 3, 0))  # (k, k, 1, B*C)
    acc = jnp.float64 if images.dtype == jnp.float64 else jnp.float32
    out = jax.lax.conv_general_dilated(
        x.astype(acc),
        wgt.astype(acc),
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
    )
    ho, wo = out.shape[1], out.shape[2]
    out = out.reshape(ho, wo, b, c).transpose(2, 0, 1, 3)
    return out.astype(images.dtype)


def _batch_blur_s2d(images: jnp.ndarray, kernels: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Strided per-sample depthwise conv via space-to-depth + shift einsums.

    out[b,Y,X,c] = sum_{i,j} xpad[b, s*Y+i, s*X+j, c] * K[b,i,j], evaluated
    as ceil(k/s)^2 shifted einsums over the s2d layout - pure VPU work, no
    feature groups.
    """
    b, h, w, c = images.shape
    k = kernels.shape[-1]
    s = stride
    pad = (k - 1) // 2
    h_out = (h + 2 * pad - k) // s + 1
    w_out = (w + 2 * pad - k) // s + 1
    t = -(-k // s)  # taps per phase
    kp = t * s
    # pad input so every needed index exists and dims are s-divisible
    hi_h = (s * (h_out - 1 + t) ) - h - pad + s  # generous upper padding
    hi_w = (s * (w_out - 1 + t) ) - w - pad + s
    xpad = jnp.pad(images, ((0, 0), (pad, max(hi_h, 0)), (pad, max(hi_w, 0)), (0, 0)))
    hp = xpad.shape[1] - xpad.shape[1] % s
    wp = xpad.shape[2] - xpad.shape[2] % s
    xpad = xpad[:, :hp, :wp]
    xs = xpad.reshape(b, hp // s, s, wp // s, s, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5)  # (B, Hp/s, Wp/s, s, s, C)
    kpad = jnp.pad(kernels, ((0, 0), (0, kp - k), (0, kp - k)))
    kk = kpad.reshape(b, t, s, t, s)  # (B, a, dy, b', dx)
    acc = jnp.float64 if images.dtype == jnp.float64 else jnp.float32
    out = jnp.zeros((b, h_out, w_out, c), acc)
    for a in range(t):
        for bb in range(t):
            block = jax.lax.dynamic_slice(
                xs, (0, a, bb, 0, 0, 0), (b, h_out, w_out, s, s, c)
            ).astype(acc)
            out = out + jnp.einsum("bhwijc,bij->bhwc", block, kk[:, a, :, bb, :].astype(acc))
    return out.astype(images.dtype)


@functools.partial(jax.jit, static_argnames=("scale_factor", "method"))
def degrade(
    hr: jnp.ndarray,
    kernels: jnp.ndarray,
    scale_factor: int = 4,
    method: str = "bicubic",
) -> jnp.ndarray:
    """Fused degradation: per-sample blur then /scale_factor downsample.

    Mirrors CrackDataSet.__getitem__ (`crack_dataset.py:51-62`):
    `conv_kernel2d` followed by FactorResize bicubic.
    hr: (B, H, W, C) in [0,1]; kernels: (B, k, k) sum-1.
    """
    blurred = batch_blur(hr, kernels)
    h, w = blurred.shape[1:3]
    return resize(blurred, (h // scale_factor, w // scale_factor), method=method)


def _kernel_cli(argv=None):
    """Blur-kernel generator CLI (`blur.py:241-282` __main__ probe):
    `python -m csbsr_tpu.ops.blur OUTPUT_DIR NUM [--mode gaus|disk|motion]
    [--size 21] [--seed 0]` dumps NUM random kernels as max-normalised
    grayscale PNGs named 0.png..NUM-1.png, like the reference's make_blur
    (mode "gaus", sigma ranges (0.2, 4.0) both axes, anisotropic)."""
    import argparse
    import os

    import numpy as np
    from PIL import Image

    from ..utils.cache import honor_platform_env

    honor_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("output_dir")
    ap.add_argument("num", type=int)
    ap.add_argument("--mode", default="gaus", choices=["gaus", "disk", "motion"])
    ap.add_argument("--size", type=int, default=21)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    key = jax.random.PRNGKey(args.seed)
    if args.mode == "gaus":
        kerns = gaussian_kernels(key, args.num, size=args.size,
                                 sigma_range=(0.2, 4.0), sigma_range2=(0.2, 4.0))
    elif args.mode == "disk":
        kerns = disk_kernels(key, args.num, size=args.size)
    else:
        kerns = motion_kernels(key, args.num, size=args.size)

    os.makedirs(args.output_dir, exist_ok=True)
    kerns = np.asarray(kerns)
    for i, k in enumerate(kerns):
        img = (k / k.max() * 255.0).astype(np.uint8)
        Image.fromarray(img, "L").save(os.path.join(args.output_dir, f"{i}.png"))
    print(f"wrote {args.num} {args.mode} kernels to {args.output_dir}")


if __name__ == "__main__":
    _kernel_cli()
