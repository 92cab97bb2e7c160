"""Shared NN blocks (flax.linen, NHWC).

TPU-native rebuild of the reference block libraries:
  - `/root/reference/model/modeling/base_networks.py` (DBPN blocks: ConvBlock/
    DeconvBlock bias=True, PReLU(0.25), no norm; UpBlock/DownBlock/D_*)
  - `/root/reference/model/modeling/kbpn.py:192-289` (BlockBase family:
    bias=False, ReLU/PReLU(0.01)/LeakyReLU(0.01), optional BatchNorm,
    kaiming/xavier init chosen by activation)
  - `/root/reference/model/modeling/blocks.py` (SFTLikeBlock / SFTBlock)

Layout is NHWC (TPU-preferred); deconvs use explicit padding chosen for
torch `ConvTranspose2d(k, s, p)` output-shape parity: lax padding
(k-1-p, k-1-p) gives out = (in-1)*s + k - 2p.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import pixel_shuffle
from ..ops.s2d import s2d_conv, s2d_deconv, can_s2d_conv, can_s2d_deconv

Dtype = Any

# The space-to-depth lowering (ops/s2d.py) was a round-1 win, but the current
# libtpu compiles the native strided k8s4 (de)convs 2-4x FASTER than the
# hand lowering (measured: deconv 134 vs 65 TF/s, conv 120 vs 32 TF/s at
# B=128 - see PERF.md). Default to native; CSBSR_USE_S2D=1 re-enables the
# lowering for A/B (both paths share identical param layouts).
import os as _os

USE_S2D = _os.environ.get("CSBSR_USE_S2D", "0") == "1"

# Opt-in int8 serving mode (CSBSR_INT8_SERVE=1): eval-path convs run as
# int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e; measured 1.78x on
# 3x3 chains at flagship shapes, PERF.md round 3). Param layouts stay
# identical to the bf16 modules, so any checkpoint serves in either mode.
# Activation scales are static when a calibrated `quant` collection is in
# `variables` (run the model once with mutable=["quant"] to record
# abs-maxima), dynamic (per-call abs-max reduce) otherwise. Accuracy is
# checkpoint-dependent: validate with tools/int8_accuracy.py before use.
INT8_SERVE = _os.environ.get("CSBSR_INT8_SERVE", "0") == "1"
# which convs quantize: "all" (default) = every ConvBlock/DeconvBlock conv
# including the k8s4 back-projection (de)convs; "narrow" = stride-1 k<=3
# convs only, for A/B. Measured end-to-end (flagship, B=128, static scales,
# seg head excluded from the harness): bf16 351.6 / narrow 355.9 / all
# 380.6 img/s - with CALIBRATED static scales the k8s4 quantization pays
# (with dynamic per-call scales it measured at or below parity, which is
# why calibration matters).
INT8_SCOPE = _os.environ.get("CSBSR_INT8_SCOPE", "all")

from jax import lax as _lax

from ..ops.quant import int8_conv, int8_conv_transpose


class Int8Conv(nn.Module):
    """nn.Conv-compatible params; int8 serving compute (see INT8_SERVE)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    kernel_init: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", init, (k, k, x.shape[-1] // self.groups, self.features)
        )
        pad = [(self.padding, self.padding)] * 2
        calibrating = self.is_mutable_collection("quant")
        if calibrating:
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        if calibrating or not INT8_SERVE:
            y = _lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride,) * 2, pad, rhs_dilation=(self.dilation,) * 2,
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            amax = (
                self.get_variable("quant", "act_amax")
                if self.has_variable("quant", "act_amax") else None
            )
            y = int8_conv(
                x.astype(self.dtype), kernel,
                strides=(self.stride,) * 2, padding=pad,
                dilation=(self.dilation,) * 2, groups=self.groups,
                act_amax=amax, out_dtype=self.dtype,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Int8Deconv(nn.Module):
    """nn.ConvTranspose(transpose_kernel=True)-compatible params; int8 serve."""

    features: int
    kernel_size: int
    stride: int
    padding: int  # torch padding p; lax pad is (k-1-p)
    use_bias: bool = True
    kernel_init: Any = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, p = self.kernel_size, self.padding
        init = self.kernel_init or nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (k, k, self.features, x.shape[-1]))
        pad = [(k - 1 - p, k - 1 - p)] * 2
        calibrating = self.is_mutable_collection("quant")
        if calibrating:
            amax = self.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
            amax.value = jnp.maximum(amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
        if calibrating or not INT8_SERVE:
            y = _lax.conv_transpose(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (self.stride,) * 2, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
        else:
            amax = (
                self.get_variable("quant", "act_amax")
                if self.has_variable("quant", "act_amax") else None
            )
            y = int8_conv_transpose(
                x.astype(self.dtype), kernel,
                strides=(self.stride,) * 2, padding=pad,
                act_amax=amax, out_dtype=self.dtype,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def qconv(features, kernel_size, *, stride=1, padding=0, dilation=1,
          groups=1, use_bias=True, kernel_init=None, dtype=jnp.float32,
          name=None, train=False):
    """nn.Conv-compatible factory for eval-path int8 serving.

    Returns Int8Conv when the int8 serving mode is active (INT8_SERVE, eval
    only, scope rules as in ConvBlock), else nn.Conv — with an IDENTICAL
    param tree (<name>/kernel[, /bias]) either way, so checkpoints are
    interchangeable. Square kernels / symmetric int padding only (every
    conv in the model zoo fits).
    """
    if INT8_SERVE and not train and (
        INT8_SCOPE == "all" or (kernel_size <= 3 and stride == 1)
    ):
        return Int8Conv(features, kernel_size, stride, padding, dilation,
                        groups, use_bias, kernel_init, dtype, name=name)
    return nn.Conv(
        features, (kernel_size, kernel_size), strides=(stride, stride),
        padding=[(padding, padding)] * 2, kernel_dilation=(dilation, dilation),
        feature_group_count=groups, use_bias=use_bias,
        kernel_init=kernel_init or nn.initializers.lecun_normal(),
        dtype=dtype, name=name,
    )


def qdeconv(features, kernel_size, *, stride, padding, use_bias=True,
            kernel_init=None, dtype=jnp.float32, name=None, train=False):
    """nn.ConvTranspose(transpose_kernel=True)-compatible factory for
    eval-path int8 serving. `padding` is the TORCH convention p (the lax
    pad is k-1-p), matching Int8Deconv and every deconv in the model zoo.
    Param tree (<name>/kernel[, /bias]) identical either way."""
    if INT8_SERVE and not train and INT8_SCOPE == "all":
        return Int8Deconv(features, kernel_size, stride, padding,
                          use_bias, kernel_init, dtype, name=name)
    lp = kernel_size - 1 - padding
    return nn.ConvTranspose(
        features, (kernel_size, kernel_size), strides=(stride, stride),
        padding=[(lp, lp)] * 2, transpose_kernel=True, use_bias=use_bias,
        kernel_init=kernel_init or nn.initializers.lecun_normal(),
        dtype=dtype, name=name,
    )


class _S2DConv(nn.Module):
    """nn.Conv-compatible params; computes via the space-to-depth lowering."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    kernel_init: Any
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", self.kernel_init, (k, k, x.shape[-1], self.features))
        y = s2d_conv(x.astype(self.dtype), kernel.astype(self.dtype), self.stride, self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class _S2DDeconv(nn.Module):
    """nn.ConvTranspose(transpose_kernel=True)-compatible params; s2d compute."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    use_bias: bool
    kernel_init: Any
    dtype: Dtype

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        # transpose_kernel layout: (k, k, O, I)
        kernel = self.param("kernel", self.kernel_init, (k, k, self.features, x.shape[-1]))
        y = s2d_deconv(x.astype(self.dtype), kernel.astype(self.dtype), self.stride, self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def kaiming_normal_leaky(a: float = 0.0):
    """torch kaiming_normal_(mode='fan_in', nonlinearity='leaky_relu', a=a).

    std = gain / sqrt(fan_in), gain = sqrt(2 / (1 + a^2)).
    flax kernels are (kh, kw, in, out) -> fan_in = kh*kw*in.
    """
    gain = (2.0 / (1.0 + a * a)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
        else:
            fan_in = shape[0]
        std = gain / (fan_in**0.5)
        return jax.random.normal(key, shape, dtype) * std

    return init


def xavier_normal(gain: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 4:
            fan_in = shape[0] * shape[1] * shape[2]
            fan_out = shape[0] * shape[1] * shape[3]
        else:
            fan_in, fan_out = shape[0], shape[1]
        std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.normal(key, shape, dtype) * std

    return init


def _init_for_activation(activation: Optional[str]):
    """Weight init convention of BlockBase.create_block (kbpn.py:228-238)."""
    if activation == "relu":
        return kaiming_normal_leaky(0.0)
    if activation in ("prelu", "lrelu"):
        return kaiming_normal_leaky(0.01)
    if activation == "tanh":
        return xavier_normal(5.0 / 3.0)
    return xavier_normal(1.0)


class PReLU(nn.Module):
    """torch nn.PReLU (single shared slope)."""

    init_value: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda k: jnp.array(self.init_value, jnp.float32))
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def make_activation(name: Optional[str], prelu_init: float = 0.25, lrelu_slope: float = 0.2):
    if name is None:
        return None
    if name == "relu":
        return lambda mdl, x: nn.relu(x)
    if name == "prelu":
        return lambda mdl, x: PReLU(init_value=prelu_init, name=None)(x)
    if name == "lrelu":
        return lambda mdl, x: nn.leaky_relu(x, negative_slope=lrelu_slope)
    if name == "tanh":
        return lambda mdl, x: jnp.tanh(x)
    if name == "sigmoid":
        return lambda mdl, x: nn.sigmoid(x)
    raise NotImplementedError(name)


class ConvBlock(nn.Module):
    """Conv -> (norm) -> (act).

    Two reference conventions are covered by the flags:
      base_networks.ConvBlock: bias=True, activation='prelu' (init .25),
        norm=None, lrelu slope 0.2 (base_networks.py:55-95)
      kbpn BlockBase ConvBlock: bias=False, activation='relu',
        normalization='batch', PReLU(init=.01), LeakyReLU(.01)
        (kbpn.py:266-270, 192-249)
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    activation: Optional[str] = "relu"
    norm: Optional[str] = "batch"
    prelu_init: float = 0.01
    lrelu_slope: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = _init_for_activation(self.activation)
        use_s2d = (
            USE_S2D
            and self.groups == 1
            and self.dilation == 1
            and can_s2d_conv(self.kernel_size, self.stride, self.padding)
            and (x.shape[1] + 2 * self.padding) % self.stride == 0
            and (x.shape[2] + 2 * self.padding) % self.stride == 0
        )
        if use_s2d:
            x = _S2DConv(
                self.features, self.kernel_size, self.stride, self.padding,
                self.use_bias, init, self.dtype, name="conv",
            )(x)
        elif INT8_SERVE and not train and (
            INT8_SCOPE == "all" or (self.kernel_size <= 3 and self.stride == 1)
        ):
            x = Int8Conv(
                self.features, self.kernel_size, self.stride, self.padding,
                self.dilation, self.groups, self.use_bias, init, self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                kernel_init=init,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = _apply_norm(self, x, self.norm, train, self.dtype)
        act = make_activation(self.activation, self.prelu_init, self.lrelu_slope)
        if act is not None:
            x = act(self, x)
        return x


class DeconvBlock(nn.Module):
    """ConvTranspose -> (norm) -> (act); torch ConvTranspose2d shape parity."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    prelu_init: float = 0.01
    lrelu_slope: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, p = self.kernel_size, self.padding
        init = _init_for_activation(self.activation)
        if USE_S2D and can_s2d_deconv(k, self.stride, p):
            x = _S2DDeconv(
                self.features, k, self.stride, p, self.use_bias, init,
                self.dtype, name="deconv",
            )(x)
        elif INT8_SERVE and not train and INT8_SCOPE == "all":
            x = Int8Deconv(
                self.features, k, self.stride, p, self.use_bias, init,
                self.dtype, name="deconv",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                (k, k),
                strides=(self.stride, self.stride),
                padding=[(k - 1 - p, k - 1 - p)] * 2,
                use_bias=self.use_bias,
                kernel_init=init,
                transpose_kernel=True,
                dtype=self.dtype,
                name="deconv",
            )(x)
        x = _apply_norm(self, x, self.norm, train, self.dtype)
        act = make_activation(self.activation, self.prelu_init, self.lrelu_slope)
        if act is not None:
            x = act(self, x)
        return x


class ConvAndPixelShuffleBlock(nn.Module):
    """Conv producing C*r^2 channels -> norm/act -> PixelShuffle (kbpn.py:280-289)."""

    features: int
    factor: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_bias: bool = False
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    prelu_init: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(
            self.features * self.factor**2,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=self.use_bias,
            activation=self.activation,
            norm=self.norm,
            prelu_init=self.prelu_init,
            dtype=self.dtype,
            name="block",
        )(x, train)
        return pixel_shuffle(x, self.factor)


def _apply_norm(mdl: nn.Module, x, norm: Optional[str], train: bool, dtype):
    if norm is None or norm == "spectral":
        return x
    if norm == "batch":
        # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1. On a sharded
        # batch under jit, the mean/var reductions are global across the
        # mesh, which *is* SyncBN (SURVEY.md 2.9) - no comm code needed.
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
        )(x)
    if norm == "instance":
        return nn.GroupNorm(num_groups=x.shape[-1], use_bias=False, use_scale=False, dtype=dtype)(x)
    if norm == "group":
        return nn.GroupNorm(num_groups=32, dtype=dtype)(x)
    raise NotImplementedError(norm)


# --------------------------------------------------------------------------
# DBPN back-projection blocks (base_networks.py:236-293). These use the
# base_networks ConvBlock convention: bias=True, prelu(0.25), no norm.
# --------------------------------------------------------------------------


def _bn_conv(features, k, s, p, dtype, name):
    return ConvBlock(
        features, k, s, p, use_bias=True, activation="prelu", norm=None,
        prelu_init=0.25, dtype=dtype, name=name,
    )


def _bn_deconv(features, k, s, p, dtype, name):
    return DeconvBlock(
        features, k, s, p, use_bias=True, activation="prelu", norm=None,
        prelu_init=0.25, dtype=dtype, name=name,
    )


class UpBlock(nn.Module):
    """base_networks.py:236-248."""

    num_filter: int
    kernel_size: int = 8
    stride: int = 4
    padding: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h0 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv1")(x, train)
        l0 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv2")(h0, train)
        h1 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv3")(l0 - x, train)
        return h1 + h0


class D_UpBlock(nn.Module):
    """base_networks.py:250-264."""

    num_filter: int
    kernel_size: int = 8
    stride: int = 4
    padding: int = 2
    num_stages: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bn_conv(self.num_filter, 1, 1, 0, self.dtype, "conv")(x, train)
        h0 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv1")(x, train)
        l0 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv2")(h0, train)
        h1 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "up_conv3")(l0 - x, train)
        return h1 + h0


class DownBlock(nn.Module):
    """base_networks.py:266-278."""

    num_filter: int
    kernel_size: int = 8
    stride: int = 4
    padding: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        l0 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv1")(x, train)
        h0 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv2")(l0, train)
        l1 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv3")(h0 - x, train)
        return l1 + l0


class D_DownBlock(nn.Module):
    """base_networks.py:280-293."""

    num_filter: int
    kernel_size: int = 8
    stride: int = 4
    padding: int = 2
    num_stages: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _bn_conv(self.num_filter, 1, 1, 0, self.dtype, "conv")(x, train)
        l0 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv1")(x, train)
        h0 = _bn_deconv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv2")(l0, train)
        l1 = _bn_conv(self.num_filter, self.kernel_size, self.stride, self.padding, self.dtype, "down_conv3")(h0 - x, train)
        return l1 + l0


# --------------------------------------------------------------------------
# SFT conditioning blocks
# --------------------------------------------------------------------------


class SFTLayer(nn.Module):
    """kbpn.py:493-518: scale/shift from concat(features, condition)."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features, conditions, train: bool = False):
        cat = jnp.concatenate([features, conditions], axis=-1)
        c = cat.shape[-1]
        if INT8_SERVE and not train:
            conv = lambda f, name: Int8Conv(f, 3, 1, 1, dtype=self.dtype, name=name)
        else:
            conv = lambda f, name: nn.Conv(
                f, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name=name
            )
        scale = conv(c, "SFT_scale_conv0")(cat)
        scale = conv(self.out_features, "SFT_scale_conv1")(nn.leaky_relu(scale, 0.1))
        scale = nn.sigmoid(scale)
        shift = conv(c, "SFT_shift_conv0")(cat)
        shift = conv(self.out_features, "SFT_shift_conv1")(nn.leaky_relu(shift, 0.1))
        return features * scale + shift


def _sft_branch(mdl_dtype, inp, out_features, final_act, name_prefix, train=False):
    """Two ConvBlocks: (in->in, prelu) then (in->out, final_act); bias=True,
    no norm (blocks.py:105-139)."""
    in_ch = inp.shape[-1]
    x = ConvBlock(
        in_ch, 3, 1, 1, use_bias=True, activation="prelu", norm=None,
        prelu_init=0.01, dtype=mdl_dtype, name=f"{name_prefix}0",
    )(inp, train)
    return ConvBlock(
        out_features, 3, 1, 1, use_bias=True, activation=final_act, norm=None,
        dtype=mdl_dtype, name=f"{name_prefix}1",
    )(x, train)


class SFTLikeBlock(nn.Module):
    """blocks.py:105-120: SFT over concat(features, conditions)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        cat = jnp.concatenate([x, cond], axis=-1)
        scale = _sft_branch(self.dtype, cat, self.features, "sigmoid", "conv_scale", train)
        shift = _sft_branch(self.dtype, cat, self.features, None, "conv_shift", train)
        return x * scale + shift


class SFTBlock(nn.Module):
    """blocks.py:123-139: SFT from conditions only."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, train: bool = False):
        scale = _sft_branch(self.dtype, cond, self.features, "sigmoid", "conv_scale", train)
        shift = _sft_branch(self.dtype, cond, self.features, None, "conv_shift", train)
        return x * scale + shift


# --------------------------------------------------------------------------
# Pooling with indices (SegNet / CrackFormer MaxUnpool path)
# --------------------------------------------------------------------------


def max_pool_with_indices(x: jnp.ndarray, window: int = 2, stride: int = 2):
    """Max pool returning per-window argmax indices (flattened within window).

    TPU-native MaxUnpool support (SURVEY.md 7 step 8): indices are local to
    each window so unpooling is a scatter-free one-hot multiply.
    x: (B, H, W, C) with H, W divisible by window.
    """
    b, h, w, c = x.shape
    xw = x.reshape(b, h // window, window, w // window, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // window, w // window, window * window, c)
    idx = jnp.argmax(xw, axis=3)
    pooled = jnp.max(xw, axis=3)
    return pooled, idx


def max_unpool(pooled: jnp.ndarray, idx: jnp.ndarray, window: int = 2):
    """Inverse of max_pool_with_indices: place values at argmax positions."""
    b, hp, wp, c = pooled.shape
    onehot = jax.nn.one_hot(idx, window * window, axis=3, dtype=pooled.dtype)
    xw = pooled[:, :, :, None, :] * onehot  # (b, hp, wp, win*win, c)
    xw = xw.reshape(b, hp, wp, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    return xw.reshape(b, hp * window, wp * window, c)
