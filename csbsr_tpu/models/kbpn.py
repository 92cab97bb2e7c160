"""KBPN - Kernelized Back-Projection Network (the CSBSR SR core).

TPU-native rebuild of `/root/reference/model/modeling/kbpn.py`.

Key re-designs vs the reference (behaviour preserved):
  - The per-sample pseudo-LR Python loop (`kbpn.py:395-402`) is one grouped
    convolution (`ops.blur.batch_blur`), batched across the whole step.
  - Blur kernels flow as (B, k^2) vectors.  The reference carries spatially
    expanded kernel maps and GAPs them back at every use; since every
    consumer first applies GAP, a vector is mathematically identical and
    saves HBM bandwidth.  The one true spatial use (SFT conditioning and the
    IKC kernel-feature convs, `kbpn.py:511-518,565-567`) broadcasts the
    vector back to a map at that point.
  - The iteration-dependent phase logic (`kbpn.py:84-155`: GT kernel during
    SR pretrain, module freezing) becomes branch-free selection on a
    `use_gt_kernel` scalar carried in the phase pytree; `requires_grad`
    flipping becomes gradient masks in the train step (engine/train_state).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import (
    ConvBlock,
    DeconvBlock,
    ConvAndPixelShuffleBlock,
    _apply_norm,
    _init_for_activation,
    kaiming_normal_leaky,
    make_activation,
    xavier_normal,
)
from ..ops.resize import resize
from ..ops.blur import batch_blur
from ..ops.banded import (
    banded_from_vector,
    banded_conv3x3,
    banded_conv1x1,
    materialize,
)
from ..ops.gap_conv import gap_conv3x3

import os as _os

# A/B switch: materialise the IKC kernel-feature chain densely instead of
# using the banded/gap-collapse forms (identical math and param layout).
_DENSE_IKC = _os.environ.get("CSBSR_DENSE_IKC", "0") == "1"

# Consumer-merged narrow convs (default ON). The per-stage sr_reconst and
# the output conv produce only 3 channels; on the MXU a conv with <=48
# output channels costs the SAME as one with 3 (lanes pad to 128:
# 128->3/15/48 all measure ~11 ms at B=128 flagship shapes, PERF.md round
# 3). So instead of 14 separate 3-channel conv passes (stage j's
# sr_reconst = j slice convs over h_1..h_j, plus 4 output slices), emit ONE
# conv per producer h_i whose output channels concatenate every future
# consumer's slice: conv(h_i, [W_i^(i+1) | ... | W_i^(N) | W_i^(out)]).
# 14 passes -> 2N passes (one pre-conv on h_j_pre per stage + one merged
# conv per h_j_post), exact same math, identical param layout.
# CSBSR_MERGED_SR=0 restores the per-stage form for A/B.
_MERGED_SR = _os.environ.get("CSBSR_MERGED_SR", "1") == "1"


class _ConvParams(nn.Module):
    """Bare conv kernel/bias holder, param-path compatible with ConvBlock's
    inner nn.Conv (path <parent>/conv/kernel)."""

    shape: tuple
    use_bias: bool = False
    kernel_init: Any = None

    @nn.compact
    def __call__(self):
        init = self.kernel_init or kaiming_normal_leaky(0.01)
        k = self.param("kernel", init, self.shape)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],)) if self.use_bias else None
        return k, b


class _BandedConvBlock(nn.Module):
    """ConvBlock-equivalent (bias=False, norm=None) on a banded map.

    Param-path compatible with ConvBlock (<name>/conv/kernel) so checkpoints
    are interchangeable with the dense implementation.
    """

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "lrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, vals):
        k, _ = _ConvParams(
            (self.kernel_size, self.kernel_size, vals.shape[-1], self.features),
            name="conv",
        )()
        k = k.astype(self.dtype)
        if self.kernel_size == 3:
            out = banded_conv3x3(vals.astype(self.dtype), k)
        else:
            out = banded_conv1x1(vals.astype(self.dtype), k)
        if self.activation == "lrelu":
            out = nn.leaky_relu(out, 0.01)
        elif self.activation == "relu":
            out = nn.relu(out)
        return out


class _SplitCat1x1(nn.Module):
    """fe_cat0: 1x1 conv over concat(full_map, banded_map) without
    materialising the banded channels. Param path = <name>/conv/kernel with
    the full concatenated input-channel count."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, full_map, banded_vals):
        cf = full_map.shape[-1]
        cb = banded_vals.shape[-1]
        k, _ = _ConvParams((1, 1, cf + cb, self.features), name="conv")()
        k = k.astype(self.dtype)
        out_full = jnp.einsum("bhwc,co->bhwo", full_map.astype(self.dtype), k[0, 0, :cf])
        out_band = banded_conv1x1(banded_vals.astype(self.dtype), k[:, :, cf:])
        h, w = full_map.shape[1:3]
        out = out_full + materialize(out_band, h, w)
        return nn.leaky_relu(out, 0.01)

class _GAPConv3x3Block(nn.Module):
    """GAP(ConvBlock(k=3, bias=False, act=None, norm=None)(x)) computed via
    ops.gap_conv.gap_conv3x3.  Param-path compatible with ConvBlock
    (<name>/conv/kernel), so checkpoints interchange with the dense form."""

    features: int

    @nn.compact
    def __call__(self, x):
        # init matches ConvBlock's convention for activation=None (xavier)
        k, _ = _ConvParams(
            (3, 3, x.shape[-1], self.features),
            kernel_init=xavier_normal(1.0), name="conv",
        )()
        return gap_conv3x3(x, k)


_CONV_SETTING = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


def normalize_kernel_vec(vec: jnp.ndarray) -> jnp.ndarray:
    """vec / vec.sum(axis=-1), the reference's sum-1 renormalisation
    (`kbpn.py:328,392`). vec: (B, k^2)."""
    return vec / jnp.sum(vec, axis=-1, keepdims=True)


class VGGFeat(nn.Module):
    """VGG16 conv1_1..conv2_2 head without the pool (`kbpn.py:42-56`).

    3->64->64->128->128, all 3x3 pad 1 with bias + ReLU.  Pretrained ImageNet
    weights can be injected via the torch checkpoint converter.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate([64, 64, 128, 128]):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x


class PredictorWithGAP(nn.Module):
    """Initial kernel predictor (`kbpn.py:292-341`).

    3 ConvBlocks (prelu 0.01, no norm, no bias) -> GAP -> normalise, or
    bicubic-upsample path when the estimated size differs from the output
    size.  Returns the kernel as a (B, k_out^2) vector.
    """

    input_ch: int
    estimate_ksize: int
    ksize_output: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.estimate_ksize**2
        for i, ch in enumerate([self.input_ch, self.input_ch, out_ch]):
            x = ConvBlock(
                ch, 3, 1, 1, activation="prelu", norm=None, prelu_init=0.01,
                dtype=self.dtype, name=f"feat_ext{i}",
            )(x, train)
        vec = jnp.mean(x, axis=(1, 2))  # GAP -> (B, est^2)
        if self.ksize_output != self.estimate_ksize:
            k = vec.reshape(-1, self.estimate_ksize, self.estimate_ksize, 1)
            k = resize(k, (self.ksize_output, self.ksize_output), method="bicubic")
            k = k / jnp.sum(k, axis=(1, 2), keepdims=True)
            vec = k.reshape(-1, self.ksize_output**2)
        else:
            vec = normalize_kernel_vec(vec)
        return vec


class KernelPredictorLikeIKC(nn.Module):
    """IKC-style kernel refiner (`kbpn.py:521-602`).

    delta = GAP(convs(cat(feats(SR), feats(expand(prev_kernel))))),
    returns prev_kernel + delta (as vectors).
    """

    estimate_ksize: int
    ksize_output: int
    zero_pad_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sr, pre_kernel_vec, train: bool = False):
        kernel_ch = self.estimate_ksize**2
        red = 32
        cb = lambda ch, ks, pd, act, name: ConvBlock(
            ch, ks, 1, pd, activation=act, norm=None, prelu_init=0.01,
            lrelu_slope=0.01, dtype=self.dtype, name=name,
        )
        # fe_SR (kbpn.py:528-532); first block uses the default 'relu'.
        f = cb(kernel_ch, 3, 1, "relu", "fe_SR0")(sr, train)
        f = cb(red, 1, 0, "lrelu", "fe_SR1")(f, train)
        f = cb(red, 3, 1, "lrelu", "fe_SR2")(f, train)
        f = cb(red, 3, 1, "lrelu", "fe_SR3")(f, train)
        fsr = cb(kernel_ch, 3, 1, "lrelu", "fe_SR4")(f, train)

        # fe_kernel convs over the spatially *constant* broadcast of the
        # previous kernel (kbpn.py:565-567). The reference materialises a
        # kernel_ch-channel HR map and convolves it; a zero-padded conv of a
        # constant map is banded (piecewise constant), so the chain runs
        # exactly on a tiny representative tile (ops/banded.py), and fe_cat0
        # (1x1) is split so the banded half is never materialised. For small
        # estimate kernels the banded bookkeeping (many small ops) can cost
        # more than the dense FLOPs it saves - CSBSR_DENSE_IKC=1 selects the
        # dense form for A/B (identical params, exact same math).
        if _DENSE_IKC:
            h, w = sr.shape[1:3]
            cond_ch = pre_kernel_vec.shape[-1]  # ksize_output^2 map channels
            fh = jnp.broadcast_to(
                pre_kernel_vec.astype(fsr.dtype)[:, None, None, :],
                (sr.shape[0], h, w, cond_ch),
            )
            fh = cb(kernel_ch, 3, 1, "lrelu", "fe_kernel0")(fh, train)
            fh = cb(kernel_ch, 3, 1, "lrelu", "fe_kernel1")(fh, train)
            d = cb(red, 1, 0, "lrelu", "fe_cat0")(jnp.concatenate([fsr, fh], -1), train)
            d = cb(red, 3, 1, "lrelu", "fe_cat1")(d, train)
            d = ConvBlock(kernel_ch, 3, 1, 1, activation=None, norm=None,
                          dtype=self.dtype, name="fe_cat2")(d, train)
            gap_acc = jnp.float64 if d.dtype == jnp.float64 else jnp.float32
            delta = jnp.mean(d.astype(gap_acc), axis=(1, 2))
        else:
            fh_b = banded_from_vector(pre_kernel_vec.astype(fsr.dtype))
            fh_b = _BandedConvBlock(kernel_ch, 3, "lrelu", dtype=self.dtype, name="fe_kernel0")(fh_b)
            fh_b = _BandedConvBlock(kernel_ch, 3, "lrelu", dtype=self.dtype, name="fe_kernel1")(fh_b)

            d = _SplitCat1x1(red, dtype=self.dtype, name="fe_cat0")(fsr, fh_b)
            d = cb(red, 3, 1, "lrelu", "fe_cat1")(d, train)
            # fe_cat2 (3x3 conv, no bias/act) feeds straight into a GAP; the
            # composition collapses to border-corrected partial sums
            # (ops/gap_conv.py) - exact, and skips a kernel_ch-channel HR map.
            delta = _GAPConv3x3Block(kernel_ch, name="fe_cat2")(d)  # (B, est^2)

        if self.ksize_output != self.estimate_ksize:
            k2d = delta.reshape(-1, self.estimate_ksize, self.estimate_ksize, 1)
            up = resize(k2d, (self.ksize_output, self.ksize_output), method="bicubic")
            up = up.reshape(-1, self.ksize_output**2)
            if self.zero_pad_kernel:
                # pad-vs-upsample discriminator (kbpn.py:543-554, 583-597)
                p = delta
                for i, ch in enumerate([8, 8]):
                    p = nn.Dense(ch, dtype=self.dtype, name=f"pad_disc{i}")(p)
                    p = nn.relu(p)
                p = nn.sigmoid(nn.Dense(1, dtype=self.dtype, name="pad_disc2")(p))
                pad = (self.ksize_output - self.estimate_ksize) // 2
                zp = jnp.pad(k2d, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
                zp = zp.reshape(-1, self.ksize_output**2)
                delta = jnp.where(p >= 0.5, up, zp)
            else:
                delta = up
        return pre_kernel_vec + delta


class KBPNUpBlock(nn.Module):
    """kbpn.py:450-469 (with the 1x1 dense-merge conv; bias=True for the merge)."""

    num_filter: int
    kernel_size: int
    stride: int
    padding: int
    pixel_shuffle: bool = False
    scale_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = lambda ch, ks, st, pd, name, bias=False: ConvBlock(
            ch, ks, st, pd, use_bias=bias, activation="prelu", norm=None,
            prelu_init=0.01, dtype=self.dtype, name=name,
        )
        x = cb(self.num_filter, 1, 1, 0, "conv", bias=True)(x, train)
        if self.pixel_shuffle:
            up = lambda name: ConvAndPixelShuffleBlock(
                self.num_filter, self.scale_factor, 3, 1, 1, activation="prelu",
                norm=None, prelu_init=0.01, dtype=self.dtype, name=name,
            )
        else:
            up = lambda name: DeconvBlock(
                self.num_filter, self.kernel_size, self.stride, self.padding,
                activation="prelu", norm=None, prelu_init=0.01, dtype=self.dtype, name=name,
            )
        h0 = up("up_conv1")(x, train)
        l0 = cb(self.num_filter, self.kernel_size, self.stride, self.padding, "up_conv2")(h0, train)
        h1 = up("up_conv3")(l0 - x, train)
        return h1 + h0


class KBPNDownBlock(nn.Module):
    """kbpn.py:472-489."""

    num_filter: int
    kernel_size: int
    stride: int
    padding: int
    pixel_shuffle: bool = False
    scale_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cb = lambda ch, ks, st, pd, name, bias=False: ConvBlock(
            ch, ks, st, pd, use_bias=bias, activation="prelu", norm=None,
            prelu_init=0.01, dtype=self.dtype, name=name,
        )
        # the 1x1 stage-merge conv runs on the per-stage slices directly
        # (see ConcatConvBlock): no concat materialisation
        x = ConcatConvBlock(
            self.num_filter, 1, 1, 0, use_bias=True, activation="prelu",
            norm=None, prelu_init=0.01, dtype=self.dtype, name="conv",
        )(x, train)
        l0 = cb(self.num_filter, self.kernel_size, self.stride, self.padding, "down_conv1")(x, train)
        if self.pixel_shuffle:
            h0 = ConvAndPixelShuffleBlock(
                self.num_filter, self.scale_factor, 3, 1, 1, activation="prelu",
                norm=None, prelu_init=0.01, dtype=self.dtype, name="down_conv2",
            )(l0, train)
        else:
            h0 = DeconvBlock(
                self.num_filter, self.kernel_size, self.stride, self.padding,
                activation="prelu", norm=None, prelu_init=0.01, dtype=self.dtype,
                name="down_conv2",
            )(l0, train)
        l1 = cb(self.num_filter, self.kernel_size, self.stride, self.padding, "down_conv3")(h0 - x, train)
        return l1 + l0


class _SplitCondConv3x3(nn.Module):
    """3x3 conv over concat(features, constant cond map), with the cond part
    evaluated on the banded representation. Param paths match nn.Conv
    (<name>/kernel, <name>/bias) over the concatenated input channels.

    In int8 serving mode (blocks.INT8_SERVE, eval only) the dense feature
    half — the FLOP bulk — runs int8 on the MXU like Int8Conv (same `quant`
    calibration collection); the banded cond half is O(k·HW) and stays in
    the compute dtype."""

    features: int
    cond_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_map, cond_banded, train: bool = False):
        from . import blocks as _blocks
        from ..ops.quant import int8_conv

        cf = feat_map.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cf + self.cond_channels, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel.astype(self.dtype)
        calibrating = self.is_mutable_collection("quant")
        if calibrating:
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(
                amax.value, jnp.max(jnp.abs(feat_map)).astype(jnp.float32)
            )
        if _blocks.INT8_SERVE and not train and not calibrating:
            amax = (
                self.get_variable("quant", "act_amax")
                if self.has_variable("quant", "act_amax") else None
            )
            out = int8_conv(
                feat_map.astype(self.dtype), kernel[:, :, :cf],
                strides=(1, 1), padding=[(1, 1)] * 2,
                act_amax=amax, out_dtype=self.dtype,
            )
        else:
            out = jax.lax.conv_general_dilated(
                feat_map.astype(self.dtype), k[:, :, :cf], (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        cond_out = banded_conv3x3(cond_banded.astype(self.dtype), k[:, :, cf:])
        h, w = feat_map.shape[1:3]
        return out + materialize(cond_out, h, w) + bias.astype(out.dtype)


class SFTLayerKBPN(nn.Module):
    """kbpn.py:493-518: SFT over concat(features, kernel-condition map).

    The condition map is spatially constant, so the first conv's condition
    half runs on the banded representation (exact; see ops/banded.py).
    """

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, kernel_vec, train: bool = False):
        from .blocks import qconv

        cond_b = banded_from_vector(kernel_vec.astype(features.dtype))
        cc = kernel_vec.shape[-1]
        c = features.shape[-1] + cc
        conv = lambda f, name: qconv(f, 3, padding=1, dtype=self.dtype,
                                     name=name, train=train)
        s0 = _SplitCondConv3x3(c, cc, dtype=self.dtype, name="SFT_scale_conv0")(features, cond_b, train)
        scale = nn.sigmoid(conv(self.out_features, "SFT_scale_conv1")(nn.leaky_relu(s0, 0.1)))
        h0 = _SplitCondConv3x3(c, cc, dtype=self.dtype, name="SFT_shift_conv0")(features, cond_b, train)
        shift = conv(self.out_features, "SFT_shift_conv1")(nn.leaky_relu(h0, 0.1))
        return features * scale + shift


class KBlock(nn.Module):
    """Kernel back-projection block (`kbpn.py:344-412`), HR error mode.

    sr_t = sr_reconst(concat_h); optionally refine kernel (IKC); build the
    pseudo-LR by depthwise-convolving sr_t with the normalised kernel at
    stride SF; back-project the LR error through a deconv and add to h.
    """

    num_filter: int
    kernel_size: int
    stride: int
    padding: int
    num_stages: int
    estimate_ksize: int
    ksize_output: int
    scale_factor: int
    sum_lr_error_pos: str = "HR"
    pixel_shuffle: bool = False
    zero_pad_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, hs, input_lr, kernel_vec, use_gt_kernel, train: bool = False,
                 sr_t=None):
        # `hs` is the tuple of per-stage HR tensors; the dense-concat conv is
        # evaluated as a sum of per-slice convs (ConcatConvBlock), so neither
        # the checkpoint residuals nor the backward replay ever materialise a
        # (B, 224, 224, stage*128) concat - those temps were the binding HBM
        # allocations of the full train step.
        # With the merged narrow-conv path (CSBSR_MERGED_SR) sr_t arrives
        # precomputed by KBPN (its kernel lives at this module's
        # sr_reconst/conv/kernel path via share_scope) and hs is just (h,).
        h = hs[-1]
        if sr_t is None:
            sr_t = ConcatConvBlock(
                3, 3, 1, 1, activation=None, norm=None, dtype=self.dtype, name="sr_reconst"
            )(hs, train)

        refined = KernelPredictorLikeIKC(
            self.estimate_ksize, self.ksize_output, self.zero_pad_kernel,
            dtype=self.dtype, name="kernel_predictor",
        )(sr_t, kernel_vec, train)
        # During the SR-pretrain window the reference skips the refiner and
        # keeps the GT kernel (kbpn.py:386-388).
        kernel_vec = jnp.where(use_gt_kernel, kernel_vec, refined)

        vec = normalize_kernel_vec(kernel_vec)
        weight = vec.reshape(-1, self.ksize_output, self.ksize_output)
        pseudo_lr = batch_blur(sr_t, weight, stride=self.scale_factor)

        error = pseudo_lr - input_lr.astype(pseudo_lr.dtype)
        if self.sum_lr_error_pos == "HR":
            if self.pixel_shuffle:
                e_h = ConvAndPixelShuffleBlock(
                    self.num_filter, self.scale_factor, 3, 1, 1, activation="prelu",
                    norm=None, prelu_init=0.01, dtype=self.dtype, name="up_conv1",
                )(error.astype(self.dtype), train)
            else:
                e_h = DeconvBlock(
                    self.num_filter, self.kernel_size, self.stride, self.padding,
                    activation="prelu", norm=None, prelu_init=0.01, dtype=self.dtype,
                    name="up_conv1",
                )(error.astype(self.dtype), train)
            return h + e_h, vec
        # 'LR' mode (kbpn.py:376-377,410-412)
        error_feat = ConvBlock(
            self.num_filter, 3, 1, 1, activation=None, norm=None, dtype=self.dtype, name="conv"
        )(error.astype(self.dtype), train)
        return h, error_feat, vec


class _NestedConvParams(nn.Module):
    """Kernel-only declaration at <name>/conv/kernel - the exact param path
    a ConcatConvBlock(name=<name>) would create. Used by the merged
    narrow-conv path to own the sr_reconst / output_conv kernels at the
    KBPN level (values are needed before the consuming stage runs)."""

    ctot: int
    features: int

    @nn.compact
    def __call__(self):
        k, _ = _ConvParams(
            (3, 3, self.ctot, self.features),
            kernel_init=xavier_normal(1.0),  # _init_for_activation(None)
            name="conv",
        )()
        return k


class _SrReconstHolder(nn.Module):
    """share_scope makes the holder itself transparent (children land
    directly under the shared KBlock scope), so the 'sr_reconst' level must
    be an inner module to reproduce stage{j}_kb/sr_reconst/conv/kernel."""

    ctot: int

    @nn.compact
    def __call__(self):
        return _NestedConvParams(self.ctot, 3, name="sr_reconst")()


class _SplitConv(nn.Module):
    """nn.Conv-compatible conv over a TUPLE of inputs, evaluated as the sum
    of per-slice convs: conv(concat(xs), W) == sum_i conv(x_i, W[:, :, c_i]).
    Param layout identical to flax nn.Conv ((k, k, sum_c, F) 'kernel' +
    'bias'), so checkpoints/translators are unaffected."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs):
        ctot = sum(x.shape[-1] for x in xs)
        kernel = self.param(
            "kernel", self.kernel_init,
            (self.kernel_size, self.kernel_size, ctot, self.features),
        )
        k = kernel.astype(self.dtype)
        out = None
        off = 0
        for x in xs:
            c = x.shape[-1]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), k[:, :, off : off + c],
                (self.stride, self.stride),
                [(self.padding, self.padding)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
            off += c
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class ConcatConvBlock(nn.Module):
    """ConvBlock semantics over a tuple of inputs WITHOUT materialising
    their channel concat: the conv runs as a sum of per-slice convs
    (_SplitConv). This matters under remat - the backward replay of the
    dense KBPN stages otherwise keeps multi-GB (B, 224, 224, stage*128)
    concat temps alive simultaneously (they were the binding allocations in
    the B=48 OOM dump). Param paths identical to ConvBlock
    (<name>/conv/kernel, optional PReLU_0)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    activation: Optional[str] = "relu"
    norm: Optional[str] = "batch"
    prelu_init: float = 0.01
    lrelu_slope: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if not isinstance(xs, (tuple, list)):
            xs = (xs,)
        init = _init_for_activation(self.activation)
        x = _SplitConv(
            self.features, self.kernel_size, self.stride, self.padding,
            self.use_bias, init, self.dtype, name="conv",
        )(xs)
        x = _apply_norm(self, x, self.norm, train, self.dtype)
        act = make_activation(self.activation, self.prelu_init, self.lrelu_slope)
        if act is not None:
            x = act(self, x)
        return x


class KBPN(nn.Module):
    """Dense KBPN (`kbpn.py:17-155`).

    __call__(lr, kernel_gt_vec, use_gt_kernel, train) -> (sr, kernel_vec)
    where kernel_vec is the normalised (B, k_out^2) prediction.
    `use_gt_kernel` is a traced scalar bool: the SR-pretrain phase flag
    (reference `sr_pretrain_iter[0] <= iter < sr_pretrain_iter[1]`,
    kbpn.py:89-93).
    """

    scale_factor: int = 4
    num_stages: int = 4
    num_channels: int = 3
    md_ch: int = 128
    estimate_ksize: int = 21
    ksize_output: int = 21
    kernel_sft: bool = True
    residual_learning: bool = True
    pixel_shuffle: bool = False
    sum_lr_error_pos: str = "HR"
    zero_pad_kernel: bool = False
    remat: bool = False  # jax.checkpoint back-projection blocks
    # 'full': remat Up/Down/KB (min memory); 'updown': remat only the wide
    # Up/Down chains and keep KBlock activations (less recompute)
    remat_scope: str = "full"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kernel_gt_vec: Optional[jnp.ndarray] = None,
        use_gt_kernel=False,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k, s, p = _CONV_SETTING[self.scale_factor]
        use_gt_kernel = jnp.asarray(use_gt_kernel)
        UpCls = nn.remat(KBPNUpBlock, static_argnums=(2,)) if self.remat else KBPNUpBlock
        DownCls = nn.remat(KBPNDownBlock, static_argnums=(2,)) if self.remat else KBPNDownBlock
        remat_kb = self.remat and self.remat_scope == "full"
        KBCls = nn.remat(KBlock, static_argnums=(5,)) if remat_kb else KBlock
        OutCls = nn.remat(ConcatConvBlock, static_argnums=(2,)) if self.remat else ConcatConvBlock

        init_f = VGGFeat(dtype=self.dtype, name="feat")(x)

        pred_vec = PredictorWithGAP(
            self.md_ch, self.estimate_ksize, self.ksize_output, dtype=self.dtype,
            name="predictor",
        )(init_f, train)
        if kernel_gt_vec is None:
            kernel_vec = pred_vec
        else:
            kernel_vec = jnp.where(use_gt_kernel, kernel_gt_vec.astype(pred_vec.dtype), pred_vec)

        mk_up = lambda st, name: UpCls(
            self.md_ch, k, s, p, self.pixel_shuffle, self.scale_factor,
            dtype=self.dtype, name=name,
        )
        mk_down = lambda name: DownCls(
            self.md_ch, k, s, p, self.pixel_shuffle, self.scale_factor,
            dtype=self.dtype, name=name,
        )
        mk_kb = lambda st, name: KBCls(
            self.md_ch, k, s, p, st, self.estimate_ksize, self.ksize_output,
            self.scale_factor, self.sum_lr_error_pos, self.pixel_shuffle,
            self.zero_pad_kernel, dtype=self.dtype, name=name,
        )

        N = self.num_stages
        md = self.md_ch
        merged = _MERGED_SR and self.sum_lr_error_pos == "HR"
        if merged:
            # narrow-conv merge (see _MERGED_SR above): declare every stage's
            # KBlock + its sr_reconst kernel (share_scope keeps the param at
            # stage{j}_kb/sr_reconst/conv/kernel) and the output_conv kernel
            # up front - weights are trace-time values, so producer h_i's
            # single merged conv can carry the slices of every future
            # consumer even though those stages haven't run yet.
            kb_mods, w_stage = {}, {}
            for stage in range(1, N + 1):
                kb_mods[stage] = mk_kb(stage, f"stage{stage}_kb")
                holder = _SrReconstHolder(stage * md, name=f"_sr_w{stage}")
                nn.share_scope(holder, kb_mods[stage])
                w_stage[stage] = holder().astype(self.dtype)
            w_out = _NestedConvParams(
                N * md, self.num_channels, name="output_conv"
            )().astype(self.dtype)

            def conv3(hmap, w):
                return jax.lax.conv_general_dilated(
                    hmap.astype(self.dtype), w, (1, 1), [(1, 1)] * 2,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            rm = (lambda f: jax.checkpoint(f)) if self.remat else (lambda f: f)

        low = init_f
        hs = []  # per-stage HR outputs; dense concats happen inside consumers
        concat_l = None
        sr_parts = {}  # merged mode: {consumer stage j: [slices from h_1..]}
        out_parts = []
        for stage in range(1, N + 1):
            final = stage == N
            h = mk_up(stage, f"stage{stage}_up")(low, train)
            if merged:
                # sr_t = sum of cached consumer slices (h_1..h_{stage-1}) +
                # this stage's own slice of h_pre - same addition order as
                # the old per-slice accumulation
                wj = w_stage[stage]
                pre = rm(conv3)(h, wj[:, :, (stage - 1) * md : stage * md])
                parts = sr_parts.get(stage, [])
                if parts:  # ascending h_i order, own slice last = old order
                    sr_t = parts[0]
                    for part in parts[1:]:
                        sr_t = sr_t + part
                    sr_t = sr_t + pre
                else:
                    sr_t = pre
                kb_out = kb_mods[stage](
                    (h,), x, kernel_vec, use_gt_kernel, train, sr_t
                )
            else:
                kb_out = mk_kb(stage, f"stage{stage}_kb")(
                    tuple(hs) + (h,), x, kernel_vec, use_gt_kernel, train
                )
            if self.sum_lr_error_pos == "LR":
                # LR mode (kbpn.py:176-186): the back-projected error joins
                # the LOW features after the DownBlock instead of h
                h, error_feat, kernel_vec = kb_out
            else:
                h, kernel_vec = kb_out
                error_feat = None
            hs.append(h)
            if merged:
                # one conv over h_post for ALL its narrow consumers
                sl = slice((stage - 1) * md, stage * md)
                consumers = list(range(stage + 1, N + 1))
                wcat = jnp.concatenate(
                    [w_stage[j][:, :, sl] for j in consumers] + [w_out[:, :, sl]],
                    axis=-1,
                )
                m = rm(conv3)(h, wcat)
                for idx, j in enumerate(consumers):
                    sr_parts.setdefault(j, []).append(m[..., 3 * idx : 3 * idx + 3])
                out_parts.append(m[..., 3 * len(consumers) :])
            if not final:
                low = mk_down(f"stage{stage}_down")(tuple(hs), train)
                if error_feat is not None:
                    low = low + error_feat
                concat_l = low if concat_l is None else jnp.concatenate([concat_l, low], axis=-1)
                if self.kernel_sft:
                    low = SFTLayerKBPN(
                        stage * self.md_ch, dtype=self.dtype, name=f"stage{stage}_sft"
                    )(concat_l, kernel_vec, train)
                else:
                    low = concat_l

        if merged:
            sr = out_parts[0]
            for p in out_parts[1:]:
                sr = sr + p
        else:
            sr = OutCls(
                self.num_channels, 3, 1, 1, activation=None, norm=None,
                dtype=self.dtype, name="output_conv",
            )(tuple(hs), train)

        if self.residual_learning:
            h_out = x.shape[1] * self.scale_factor
            w_out = x.shape[2] * self.scale_factor
            sr = sr + resize(x, (h_out, w_out), method="bicubic").astype(sr.dtype)
        return sr, kernel_vec
