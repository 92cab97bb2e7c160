"""TPU-native equivalents of the reference's vendored C++/CUDA extensions.

`/root/reference/model/modeling/hrnet_ocr/extensions/` ships five native
extensions (SURVEY.md 2.8), dormant on the shipped config but part of the
capability surface.  On TPU none needs custom kernels - each lowers to
gathers/einsums XLA maps onto the MXU/VPU:

  - CrissCrossAttention  (extensions/cc_attention/{ca.cu,functions.py})
  - deform_conv2d        (extensions/dcn/, v1 + modulated v2)
  - PacConv2d            (extensions/pacnet/pac.py:91-360)
  - SwitchNorm2d         (extensions/switchablenorms/)
  - FilterResponseNorm   (extensions/frn/)
  - bn_relu / ModuleHelper.BNReLU (tools/module_helper.py:28-120); the
    syncbn/inplace_abn variants collapse into sharded BatchNorm (BN stats
    are global over the mesh) + XLA's BN+act fusion.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


# --------------------------------------------------------------- BNReLU


def bn_relu(x, train: bool, bn_type: str = "torchbn", dtype=jnp.float32, name=None):
    """ModuleHelper.BNReLU equivalent. 'torchbn'/'torchsyncbn'/'syncbn' all
    mean the same thing here: BatchNorm with mesh-global statistics."""
    if bn_type in ("torchbn", "torchsyncbn", "syncbn", "inplace_abn"):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dtype, name=name)(x)
    elif bn_type == "gn":
        x = nn.GroupNorm(num_groups=32, dtype=dtype, name=name)(x)
    else:
        raise NotImplementedError(bn_type)
    return nn.relu(x)


# ------------------------------------------------- Criss-Cross attention


class CrissCrossAttention(nn.Module):
    """RCCA criss-cross attention (extensions/cc_attention): each pixel
    attends over its full row and column; -inf on the duplicated self
    position in the column branch. gamma-scaled residual."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        cr = max(c // 8, 1)
        q = nn.Conv(cr, (1, 1), use_bias=False, dtype=self.dtype, name="query_conv")(x)
        k = nn.Conv(cr, (1, 1), use_bias=False, dtype=self.dtype, name="key_conv")(x)
        v = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, name="value_conv")(x)
        gamma = self.param("gamma", nn.initializers.zeros, ())

        # column (H) energies: (b, h, w, h') and row (W) energies: (b, h, w, w')
        e_h = jnp.einsum("bhwc,bkwc->bhwk", q, k)
        diag = jnp.eye(h, dtype=bool)[None, :, None, :]
        e_h = jnp.where(diag, -jnp.inf, e_h)  # remove duplicate self
        e_w = jnp.einsum("bhwc,bhkc->bhwk", q, k)
        att = jax.nn.softmax(jnp.concatenate([e_h, e_w], axis=-1), axis=-1)
        a_h, a_w = att[..., :h], att[..., h:]
        out = jnp.einsum("bhwk,bkwc->bhwc", a_h, v) + jnp.einsum("bhwk,bhkc->bhwc", a_w, v)
        return gamma.astype(x.dtype) * out + x


# --------------------------------------------------- deformable conv v1/v2


def _bilinear_gather(x, ys, xs):
    """Sample x (B,H,W,C) at float coords ys/xs (B,...,) with zero padding
    outside (the dcn convention)."""
    b, h, w, c = x.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    out = 0.0
    for dy, wy_ in ((0, 1 - wy), (1, wy)):
        for dx, wx_ in ((0, 1 - wx), (1, wx)):
            yi = (y0 + dy).astype(jnp.int32)
            xi = (x0 + dx).astype(jnp.int32)
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
            batch_idx = jnp.arange(b).reshape((b,) + (1,) * (ys.ndim - 1))
            vals = x[batch_idx, yc, xc]  # (B, ..., C)
            out = out + vals * (wy_ * wx_ * valid)[..., None]
    return out


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Deformable convolution (extensions/dcn).

    x: (B,H,W,Cin); offset: (B,Ho,Wo,2*K) as (dy,dx) pairs per tap in
    row-major tap order (torch DCN layout); weight: (kh,kw,Cin,Cout);
    mask (modulated v2): (B,Ho,Wo,K) or None (v1).
    """
    b, h, w, cin = x.shape
    kh, kw = weight.shape[:2]
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    tap_y = jnp.arange(kh) * dilation
    tap_x = jnp.arange(kw) * dilation
    # (Ho, Wo, K)
    gy = base_y[:, None, None] + jnp.repeat(tap_y, kw)[None, None, :]
    gx = base_x[None, :, None] + jnp.tile(tap_x, kh)[None, None, :]
    off = offset.reshape(b, ho, wo, k, 2)
    ys = gy[None] + off[..., 0]
    xs = gx[None] + off[..., 1]
    samples = _bilinear_gather(x, ys, xs)  # (B,Ho,Wo,K,Cin)
    if mask is not None:
        samples = samples * mask[..., None]
    wk = weight.reshape(k, cin, -1)
    return jnp.einsum("bhwkc,kco->bhwo", samples, wk)


class DeformConv2d(nn.Module):
    """DCN module: internal offset (and mask for v2) predictors like
    extensions/dcn/modules/modulated_dcn.py."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    modulated: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size**2
        off_ch = 3 * k if self.modulated else 2 * k
        off = nn.Conv(
            off_ch, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            kernel_init=nn.initializers.zeros, dtype=self.dtype, name="conv_offset",
        )(x)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        if self.modulated:
            offset, mask = off[..., : 2 * k], nn.sigmoid(off[..., 2 * k :])
        else:
            offset, mask = off, None
        return deform_conv2d(
            x, offset, weight.astype(x.dtype), mask,
            self.stride, self.padding, self.dilation,
        )


# ------------------------------------------------------ pixel-adaptive conv


class PacConv2d(nn.Module):
    """Pixel-adaptive convolution (extensions/pacnet/pac.py): standard conv
    weights modulated per-position by a Gaussian feature-affinity kernel
    K(i,j,k) = exp(-0.5 ||f_i - f_{nbr k}||^2)."""

    features: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        ks = self.kernel_size
        pad = (ks - 1) // 2
        b, h, w, c = x.shape

        def unfold(v):
            vp = jnp.pad(v, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            cols = [
                vp[:, dy : dy + h, dx : dx + w]
                for dy in range(ks)
                for dx in range(ks)
            ]
            return jnp.stack(cols, axis=3)  # (B,H,W,K,C)

        xf = unfold(x)
        gf = unfold(guide)
        diff = gf - guide[:, :, :, None, :]
        kern = jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1))  # (B,H,W,K)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(), (ks, ks, c, self.features)
        ).reshape(ks * ks, c, self.features)
        return jnp.einsum("bhwk,bhwkc,kco->bhwo", kern.astype(x.dtype), xf, weight.astype(x.dtype))


# ------------------------------------------------------------- norm layers


class SwitchNorm2d(nn.Module):
    """Switchable Norm (extensions/switchablenorms): softmax-weighted blend
    of instance/layer/batch statistics, affine params."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mw = self.param("mean_weight", nn.initializers.ones, (3,))
        vw = self.param("var_weight", nn.initializers.ones, (3,))

        mean_in = jnp.mean(x, axis=(1, 2), keepdims=True)
        var_in = jnp.var(x, axis=(1, 2), keepdims=True)
        mean_ln = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        var_ln = jnp.var(x, axis=(1, 2, 3), keepdims=True)
        mean_bn = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var_bn = jnp.var(x, axis=(0, 1, 2), keepdims=True)

        mws = jax.nn.softmax(mw)
        vws = jax.nn.softmax(vw)
        mean = mws[0] * mean_in + mws[1] * mean_ln + mws[2] * mean_bn
        var = vws[0] * var_in + vws[1] * var_ln + vws[2] * var_bn
        xn = (x - mean) / jnp.sqrt(var + self.epsilon)
        return xn * weight + bias


class FilterResponseNorm(nn.Module):
    """FRN + TLU (extensions/frn): nu2 normalisation with learned threshold."""

    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        tau = self.param("tau", nn.initializers.zeros, (c,))
        nu2 = jnp.mean(x**2, axis=(1, 2), keepdims=True)
        xn = x * jax.lax.rsqrt(nu2 + self.epsilon)
        return jnp.maximum(gamma * xn + beta, tau)
