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
    """ModuleHelper.BNReLU equivalent (tools/module_helper.py:28-120).
    'torchbn'/'torchsyncbn'/'syncbn'/'inplace_abn' all mean the same thing
    here: BatchNorm with mesh-global statistics; 'sn' is SwitchNorm2d
    (module_helper.py:84-116); 'gn' GroupNorm; 'frn' FilterResponseNorm
    (which subsumes the activation via its TLU)."""
    if bn_type in ("torchbn", "torchsyncbn", "syncbn", "inplace_abn"):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dtype, name=name)(x)
    elif bn_type == "gn":
        x = nn.GroupNorm(num_groups=32, dtype=dtype, name=name)(x)
    elif bn_type == "sn":
        x = SwitchNorm2d(dtype=dtype, name=name)(x)
    elif bn_type == "frn":
        return FilterResponseNorm(dtype=dtype, name=name)(x)
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


def _unfold_nhwc(v, ks: int, stride: int = 1, padding: int = 0, dilation: int = 1):
    """im2col on NHWC: (B,H,W,C) -> (B,Ho,Wo,K,C), K = ks*ks row-major taps
    (torch F.unfold layout)."""
    b, h, w, c = v.shape
    vp = jnp.pad(v, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    ho = (h + 2 * padding - dilation * (ks - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (ks - 1) - 1) // stride + 1
    cols = [
        vp[:, dy * dilation : dy * dilation + (ho - 1) * stride + 1 : stride,
           dx * dilation : dx * dilation + (wo - 1) * stride + 1 : stride]
        for dy in range(ks)
        for dx in range(ks)
    ]
    return jnp.stack(cols, axis=3)


def pac_gauss_kernel(guide, ks: int, stride: int = 1, padding: int = 0,
                     dilation: int = 1, normalize: bool = False):
    """Gaussian feature-affinity kernel (GaussKernel2dFn, pac.py:91-141):
    K = exp(-0.5 * sum_c (f_tap - f_center)^2) over the unfolded guide.
    guide: (B,H,W,C) -> (B,Ho,Wo,K)."""
    cols = _unfold_nhwc(guide, ks, stride, padding, dilation)
    center = (ks // 2) * ks + ks // 2
    diff = cols - cols[:, :, :, center : center + 1]
    # accumulate in at least f32 (keep f64 under x64 for the oracle runs)
    diff = diff.astype(jnp.promote_types(diff.dtype, jnp.float32))
    kern = jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1))
    if normalize:
        # packernel2d (pac.py:381-386,446-449): taps that fall in the zero
        # padding are masked out (unfolded ones-pattern) BEFORE normalising
        ones = jnp.ones((1,) + guide.shape[1:3] + (1,), kern.dtype)
        mask = _unfold_nhwc(ones, ks, stride, padding, dilation)[..., 0]
        kern = kern * mask
        norm = jnp.sum(kern, axis=3, keepdims=True)
        kern = kern / (norm + (norm == 0))
    return kern.astype(guide.dtype)


class PacConvTranspose2d(nn.Module):
    """Pixel-adaptive transposed convolution (pac.py:220-307,740-790):
    zero-stuff the input by `stride`, pad by (k-1)*dilation - padding
    (+ output_padding bottom/right), unfold, modulate each tap by the
    Gaussian affinity of `guide` (given at OUTPUT resolution), and matmul
    the weights (correlation - the reference einsums the weight unflipped)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    dilation: int = 1
    use_bias: bool = True
    normalize_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, guide):
        ks, s, p, op, d = (self.kernel_size, self.stride, self.padding,
                           self.output_padding, self.dilation)
        b, h, w, c = x.shape
        # zero-stuffing (F.conv_transpose2d with a ones-diagonal weight)
        up = jnp.zeros((b, (h - 1) * s + 1, (w - 1) * s + 1, c), x.dtype)
        up = up.at[:, ::s, ::s].set(x)
        pad = (ks - 1) * d - p
        up = jnp.pad(up, ((0, 0), (pad, pad + op), (pad, pad + op), (0, 0)))
        cols = _unfold_nhwc(up, ks, 1, 0, d)  # (B,Ho,Wo,K,C)
        # affinity kernel on the output-resolution guide; asymmetric padding
        # keeps the unfold grid aligned with `cols` for even kernel sizes
        tp = (ks - 1) * d
        gp = jnp.pad(guide, ((0, 0), (tp // 2, tp - tp // 2), (tp // 2, tp - tp // 2), (0, 0)))
        kern = pac_gauss_kernel(gp, ks, 1, 0, d, normalize=self.normalize_kernel)
        weight = self.param(
            "kernel", nn.initializers.lecun_normal(), (ks, ks, c, self.features)
        ).reshape(ks * ks, c, self.features)
        out = jnp.einsum("bhwk,bhwkc,kco->bhwo", kern.astype(x.dtype), cols,
                         weight.astype(x.dtype))
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros, (self.features,))
        return out


def pac_pool2d(x, guide, kernel_size: int, stride: int = 1, padding: int = 0,
               dilation: int = 1, normalize_kernel: bool = True):
    """Pixel-adaptive pooling (PacPool2dFn, pac.py:310-360 + pacpool2d
    :503-524): affinity-weighted sum (normalized -> weighted average) over
    each window. x: (B,H,W,C); guide at input resolution."""
    kern = pac_gauss_kernel(guide, kernel_size, stride, padding, dilation,
                            normalize=normalize_kernel)
    cols = _unfold_nhwc(x, kernel_size, stride, padding, dilation)
    return jnp.einsum("bhwk,bhwkc->bhwc", kern.astype(x.dtype), cols)


# -------------------------------------------------- deformable PSROI pooling


def deform_psroi_pool(
    data: jnp.ndarray,
    rois: jnp.ndarray,
    trans: Optional[jnp.ndarray],
    *,
    pooled_size: int,
    output_dim: int,
    spatial_scale: float = 1.0,
    group_size: int = 1,
    part_size: Optional[int] = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
) -> jnp.ndarray:
    """Deformable position-sensitive ROI pooling
    (extensions/dcn/src/cuda/deform_psroi_pooling_cuda.cu:46-135).

    data: (B,H,W,C) with C == output_dim * group_size^2 (position-sensitive
    channel groups); rois: (N,5) rows [batch_idx, x1, y1, x2, y2] in image
    coords; trans: (N, part, part, 2*num_classes) learned offsets
    ((x, y) interleaved per class) or None (no_trans).
    Returns (N, pooled, pooled, output_dim).
    """
    b, h, w, c = data.shape
    part = pooled_size if part_size is None else part_size
    no_trans = trans is None
    num_classes = 1 if no_trans else trans.shape[-1] // 2
    ch_each = output_dim // num_classes

    ph = jnp.arange(pooled_size)
    pw = jnp.arange(pooled_size)
    ct = jnp.arange(output_dim)

    def one_roi(roi, tr):
        bi = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1]) * spatial_scale - 0.5
        y1 = jnp.round(roi[2]) * spatial_scale - 0.5
        x2 = (jnp.round(roi[3]) + 1.0) * spatial_scale - 0.5
        y2 = (jnp.round(roi[4]) + 1.0) * spatial_scale - 0.5
        rw = jnp.maximum(x2 - x1, 0.1)
        rh = jnp.maximum(y2 - y1, 0.1)
        bin_h = rh / pooled_size
        bin_w = rw / pooled_size
        sub_h = bin_h / sample_per_part
        sub_w = bin_w / sample_per_part

        part_h = jnp.floor(ph / pooled_size * part).astype(jnp.int32)  # (P,)
        part_w = jnp.floor(pw / pooled_size * part).astype(jnp.int32)
        class_id = ct // ch_each  # (O,)
        if no_trans:
            tx = jnp.zeros((output_dim, pooled_size, pooled_size))
            ty = jnp.zeros((output_dim, pooled_size, pooled_size))
        else:
            # tr: (part, part, 2*num_classes)
            tx = tr[part_h[:, None], part_w[None, :], 2 * class_id[:, None, None]] * trans_std
            ty = tr[part_h[:, None], part_w[None, :], 2 * class_id[:, None, None] + 1] * trans_std
        wstart = pw[None, None, :] * bin_w + x1 + tx * rw  # (O,P,P)
        hstart = ph[None, :, None] * bin_h + y1 + ty * rh

        gw = jnp.clip((pw * group_size) // pooled_size, 0, group_size - 1)
        gh = jnp.clip((ph * group_size) // pooled_size, 0, group_size - 1)
        # position-sensitive channel: (ctop*gs + gh)*gs + gw  (O,P,P)
        chan = (ct[:, None, None] * group_size + gh[None, :, None]) * group_size + gw[None, None, :]

        iw = jnp.arange(sample_per_part)
        sx = wstart[..., None, None] + iw[None, None, None, None, :] * sub_w  # (O,P,P,S,S)
        sy = hstart[..., None, None] + iw[None, None, None, :, None] * sub_h
        valid = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
        sxc = jnp.clip(sx, 0.0, w - 1.0)
        syc = jnp.clip(sy, 0.0, h - 1.0)

        img = data[bi]  # (H,W,C)
        x0 = jnp.floor(sxc).astype(jnp.int32)
        y0 = jnp.floor(syc).astype(jnp.int32)
        fx = sxc - x0
        fy = syc - y0
        x1i = jnp.minimum(x0 + 1, w - 1)
        y1i = jnp.minimum(y0 + 1, h - 1)
        cexp = jnp.broadcast_to(chan[..., None, None], sx.shape)
        v = (
            img[y0, x0, cexp] * (1 - fy) * (1 - fx)
            + img[y0, x1i, cexp] * (1 - fy) * fx
            + img[y1i, x0, cexp] * fy * (1 - fx)
            + img[y1i, x1i, cexp] * fy * fx
        )
        cnt = jnp.sum(valid, axis=(-1, -2))
        total = jnp.sum(v * valid, axis=(-1, -2))
        out = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)  # (O,P,P)
        return jnp.transpose(out, (1, 2, 0))  # (P,P,O)

    if no_trans:
        return jax.vmap(lambda r: one_roi(r, None))(rois)
    return jax.vmap(one_roi)(rois, trans)


# ----------------------------------------------------------------- PacCRF


class PacCRF(nn.Module):
    """CRF mean-field inference with pixel-adaptive message passing
    (extensions/pacnet/paccrf.py:47-225, blur=1 configuration).

    Each step: Q = softmax(logQ); message m_i = PAC(Q, K_edge_i) with a
    learned per-kernel compatibility scale; logQ = unary*w_u - sum_i m_i*w_i.
    Edge features are YXRGB-style guides passed by the caller.
    """

    channels: int
    num_steps: int = 5
    kernel_sizes: tuple = (3,)
    dilations: tuple = (1,)
    unary_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unary, edge_feat):
        n = len(self.kernel_sizes)
        w_u = self.param("unary_weight", nn.initializers.constant(self.unary_weight), ())
        w_pair = self.param("pairwise_weights", nn.initializers.ones, (n,))
        # '2d' compat (paccrf.py:96-104): Potts-style 1 - eye(C) init (zero
        # diagonal) so at init the message penalises *other* classes
        potts = lambda key, shape, dtype=jnp.float32: (
            jnp.ones(shape, dtype) - jnp.eye(shape[0], dtype=dtype)
        )
        compat = [
            self.param(f"compat{i}", potts, (self.channels, self.channels))
            for i in range(n)
        ]
        kernels = [
            pac_gauss_kernel(edge_feat, ks, 1, (ks - 1) * d // 2, d, normalize=True)
            for ks, d in zip(self.kernel_sizes, self.dilations)
        ]
        logq = unary
        for _ in range(self.num_steps):
            q = jax.nn.softmax(logq, axis=-1)
            logq = unary * w_u
            for i, (ks, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
                cols = _unfold_nhwc(q, ks, 1, (ks - 1) * d // 2, d)
                msg = jnp.einsum("bhwk,bhwkc->bhwc", kernels[i].astype(q.dtype), cols)
                msg = jnp.einsum("bhwc,cd->bhwd", msg, compat[i].astype(q.dtype))
                logq = logq - msg * w_pair[i]
        return logq


class PacCRFLoose(nn.Module):
    """paccrf.py:227-300: like PacCRF but every mean-field step has its own
    parameters (a one-step PacCRF per step, shared edge kernels)."""

    channels: int
    num_steps: int = 5
    kernel_sizes: tuple = (3,)
    dilations: tuple = (1,)
    unary_weight: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, unary, edge_feat):
        kernels = [
            pac_gauss_kernel(edge_feat, ks, 1, (ks - 1) * d // 2, d, normalize=True)
            for ks, d in zip(self.kernel_sizes, self.dilations)
        ]
        logq = unary
        n = len(self.kernel_sizes)
        for s in range(self.num_steps):
            w_u = self.param(f"step{s}_unary_weight",
                             nn.initializers.constant(self.unary_weight), ())
            w_pair = self.param(f"step{s}_pairwise_weights", nn.initializers.ones, (n,))
            q = jax.nn.softmax(logq, axis=-1)
            logq = unary * w_u
            potts = lambda key, shape, dtype=jnp.float32: (
                jnp.ones(shape, dtype) - jnp.eye(shape[0], dtype=dtype)
            )
            for i, (ks, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
                compat = self.param(f"step{s}_compat{i}", potts,
                                    (self.channels, self.channels))
                cols = _unfold_nhwc(q, ks, 1, (ks - 1) * d // 2, d)
                msg = jnp.einsum("bhwk,bhwkc->bhwc", kernels[i].astype(q.dtype), cols)
                msg = jnp.einsum("bhwc,cd->bhwd", msg, compat.astype(q.dtype))
                logq = logq - msg * w_pair[i]
        return logq


# ------------------------------------------------------------- norm layers


class SwitchNorm2d(nn.Module):
    """Switchable Norm (extensions/switchablenorms/switchable_norm.py:60-140):
    softmax-weighted blend of instance/layer/batch statistics, affine params.

    The reference arithmetic is reproduced exactly: var_in is torch's
    UNBIASED `.var(-1)` over H*W, and var_ln / var_bn come from the moment
    decomposition E[var_in + mean_in^2] - E[mean_in]^2 over C / N (NOT plain
    biased variances over (C,H,W) / (N,H,W)).  Always uses batch statistics
    (the reference's training-mode forward); the running-stat eval branch is
    not carried since 'sn' is a dormant bn_type in CSBSR."""

    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mw = self.param("mean_weight", nn.initializers.ones, (3,))
        vw = self.param("var_weight", nn.initializers.ones, (3,))

        n_hw = x.shape[1] * x.shape[2]
        mean_in = jnp.mean(x, axis=(1, 2), keepdims=True)  # (N,1,1,C)
        var_in = jnp.sum((x - mean_in) ** 2, axis=(1, 2), keepdims=True) / max(n_hw - 1, 1)
        temp = var_in + mean_in**2
        mean_ln = jnp.mean(mean_in, axis=3, keepdims=True)
        var_ln = jnp.mean(temp, axis=3, keepdims=True) - mean_ln**2
        mean_bn = jnp.mean(mean_in, axis=0, keepdims=True)
        var_bn = jnp.mean(temp, axis=0, keepdims=True) - mean_bn**2

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
