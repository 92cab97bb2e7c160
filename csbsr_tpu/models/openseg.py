"""openseg net zoo - TPU-native rebuilds of the vendored nets.

Rebuild of `/root/reference/model/modeling/hrnet_ocr/nets/{ocrnet,isanet,
ocnet,fcnet,ce2pnet,segfix,ideal_ocrnet}.py` plus their modules
(`modules/{base_oc_block,asp_oc_block,isa_block,edge_block,decoder_block,
offset_block,spatial_ocr_block}.py`).  These are dormant in CSBSR (never
imported by `build_model.py`), but they are part of the reference's
capability surface; rebuilt here so the surface is complete.

Conventions: NHWC; nets return raw logits (aux, main) upsampled to the
input size with align_corners=True, mirroring the torch forward contracts.
The default backbone is the openseg 'deepbase_resnet101_dilated8' (3-conv
deep-base stem, stages 3/4 dilated 2/4 at stride 1, output stride 8),
returning the four stage features like the torch backbone's list output;
every `_ResNetNet` subclass takes a `backbone=` arch name resolved through
`resnet_zoo.ARCH_SPECS` (the BackboneSelector namespace: plain/deepbase
resnets, resnext, resnest, wide_resnet, dilated8/16 variants).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize
from .hrnet_ocr import HRNetW48Backbone, ObjectAttention, SpatialGather, SpatialOCR
from .resnet_zoo import ResNetZooBackbone


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


def _conv_bn_relu(x, ch, k, train, dtype, name, dilation=1, bias=True):
    p = (k // 2) * dilation
    x = nn.Conv(ch, (k, k), padding=[(p, p)] * 2, kernel_dilation=(dilation, dilation),
                use_bias=bias, dtype=dtype, name=f"{name}_conv")(x)
    return nn.relu(_bn(train, dtype, f"{name}_bn")(x))


# ---------------------------------------------------------------- backbone


# The default net backbone, openseg 'deepbase_resnet101_dilated8' (3x conv3x3
# deep-base stem + maxpool, bottleneck stages (3,4,23,3), layer3/4 at stride 1
# dilation 2/4 — resnet_backbone.py DilatedResnetBackbone), is the zoo's
# default arch; the historical name stays exported.  The full arch namespace
# (resnext / resnest / wide_resnet / plain+deepbase resnets, dilated8/16)
# lives in `resnet_zoo.py`.
DeepBaseResNet101Dilated8 = ResNetZooBackbone


# ---------------------------------------------------------------- oc blocks


class SelfAttentionBlock2D(nn.Module):
    """Non-local attention with 2x(conv1x1+BNReLU) key/query transforms and
    optional spatial down-scale. Two reference styles:
      - 'base_oc' (base_oc_block.py:23-102): biased convs, plain zero-init W
      - 'isa' (isa_block.py:16-71): bias-free convs, W = Conv(no bias)+BNReLU
        with normal init
    """

    key_channels: int
    value_channels: int
    out_channels: int
    scale: int = 1
    style: str = "base_oc"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        b, h0, w0, c = x.shape
        if self.scale > 1:
            x = nn.max_pool(x, (self.scale, self.scale), strides=(self.scale, self.scale))
        h, w = x.shape[1:3]
        use_bias = self.style == "base_oc"

        def kq(v, name):
            v = nn.Conv(self.key_channels, (1, 1), use_bias=use_bias,
                        dtype=self.dtype, name=f"{name}_conv0")(v)
            v = nn.relu(_bn(train, self.dtype, f"{name}_bn0")(v))
            v = nn.Conv(self.key_channels, (1, 1), use_bias=use_bias,
                        dtype=self.dtype, name=f"{name}_conv1")(v)
            return nn.relu(_bn(train, self.dtype, f"{name}_bn1")(v))

        query = kq(x, "f_query").reshape(b, h * w, self.key_channels)
        key = kq(x, "f_key").reshape(b, h * w, self.key_channels)
        value = nn.Conv(self.value_channels, (1, 1), use_bias=use_bias,
                        dtype=self.dtype, name="f_value")(x)
        value = value.reshape(b, h * w, self.value_channels)

        sim = jnp.einsum("bnc,bmc->bnm", query, key) * (self.key_channels**-0.5)
        sim = nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bnm,bmc->bnc", sim, value).reshape(b, h, w, self.value_channels)
        if self.style == "isa":
            ctx = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                          dtype=self.dtype, name="W")(ctx)
            ctx = nn.relu(_bn(train, self.dtype, "W_bn")(ctx))
        else:
            # W is zero-initialised in the reference (base_oc_block.py:75-76)
            ctx = nn.Conv(self.out_channels, (1, 1), kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros, dtype=self.dtype, name="W")(ctx)
        if self.scale > 1:
            ctx = resize(ctx, (h0, w0), method="bilinear", align_corners=True)
        return ctx


class BaseOCModule(nn.Module):
    """base_oc_block.py:115-158: self-attention stages + concat-project."""

    key_channels: int
    value_channels: int
    out_channels: int
    dropout: float = 0.05
    sizes: Sequence[int] = (1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        ctx = None
        for i, s in enumerate(self.sizes):
            p = SelfAttentionBlock2D(self.key_channels, self.value_channels,
                                     x.shape[-1], s, dtype=self.dtype,
                                     name=f"stage{i}")(x, train)
            ctx = p if ctx is None else ctx + p
        out = jnp.concatenate([ctx, x], axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv")(out)
        out = nn.relu(_bn(train, self.dtype, "bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class BaseOCContextModule(nn.Module):
    """base_oc_block.py:161-196: context-only variant (BNReLU + dropout)."""

    key_channels: int
    value_channels: int
    out_channels: int
    dropout: float = 0.0
    sizes: Sequence[int] = (1,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        ctx = None
        for i, s in enumerate(self.sizes):
            p = SelfAttentionBlock2D(self.key_channels, self.value_channels,
                                     self.out_channels, s, dtype=self.dtype,
                                     name=f"stage{i}")(x, train)
            ctx = p if ctx is None else ctx + p
        out = nn.relu(_bn(train, self.dtype, "bn")(ctx))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ASPOCModule(nn.Module):
    """asp_oc_block.py:22-75: ASPP with an OC-context branch."""

    out_features: int = 256
    dilations: Sequence[int] = (12, 24, 36)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        f = self.out_features
        c1 = _conv_bn_relu(x, f, 3, train, self.dtype, "context_pre", bias=True)
        c1 = BaseOCContextModule(f // 2, f // 2, f, sizes=(2,), dtype=self.dtype,
                                 name="context_oc")(c1, train)
        feats = [c1, _conv_bn_relu(x, f, 1, train, self.dtype, "conv2", bias=False)]
        for i, d in enumerate(self.dilations):
            feats.append(_conv_bn_relu(x, f, 3, train, self.dtype, f"conv{i+3}",
                                       dilation=d, bias=False))
        out = jnp.concatenate(feats, axis=-1)
        out = nn.Conv(2 * f, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(out)
        out = nn.relu(_bn(train, self.dtype, "project_bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class SpatialOCRASPModule(nn.Module):
    """spatial_ocr_block.py SpatialOCR_ASP_Module: ASPP whose context branch
    is OCR attention against SpatialGather proxies of `probs`."""

    hidden: int = 256
    out_features: int = 512
    dilations: Sequence[int] = (12, 24, 36)
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, probs, train=False):
        f = self.hidden
        feat1 = _conv_bn_relu(x, f, 3, train, self.dtype, "context_pre", bias=True)
        proxy = SpatialGather()(feat1, probs)
        feat1 = ObjectAttention(f // 2, dtype=self.dtype, name="context_oab")(feat1, proxy, train)
        feats = [feat1, _conv_bn_relu(x, f, 1, train, self.dtype, "conv2", bias=True)]
        for i, d in enumerate(self.dilations):
            feats.append(_conv_bn_relu(x, f, 3, train, self.dtype, f"conv{i+3}",
                                       dilation=d, bias=True))
        out = jnp.concatenate(feats, axis=-1)
        out = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="project_conv")(out)
        out = nn.relu(_bn(train, self.dtype, "project_bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ISAModule(nn.Module):
    """isa_block.py: interlaced sparse self-attention (long+short range)."""

    key_channels: int
    value_channels: int
    out_channels: int
    down_factors: Sequence[Sequence[int]] = ((8, 8),)
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        def sa(v, in_name, out_ch):
            return SelfAttentionBlock2D(
                self.key_channels, self.value_channels, out_ch, 1,
                style="isa", dtype=self.dtype, name=in_name,
            )(v, train)

        def isa_block(v, dh, dw, name):
            n, h, w, c = v.shape
            oh, ow = -(-h // dh), -(-w // dw)
            ph, pw = oh * dh - h, ow * dw - w
            if ph or pw:
                v = jnp.pad(v, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
            # long range: group pixels with the same intra-cell offset
            v = v.reshape(n, oh, dh, ow, dw, c)
            v = v.transpose(0, 2, 4, 1, 3, 5).reshape(n * dh * dw, oh, ow, c)
            v = sa(v, f"{name}_long", self.out_channels)
            c2 = self.out_channels
            # short range: attend within each cell
            v = v.reshape(n, dh, dw, oh, ow, c2)
            v = v.transpose(0, 3, 4, 1, 2, 5).reshape(n * oh * ow, dh, dw, c2)
            v = sa(v, f"{name}_short", self.out_channels)
            v = v.reshape(n, oh, ow, dh, dw, c2).transpose(0, 1, 3, 2, 4, 5)
            v = v.reshape(n, oh * dh, ow * dw, c2)
            if ph or pw:
                v = v[:, ph // 2 : ph // 2 + h, pw // 2 : pw // 2 + w]
            return v

        priors = [isa_block(x, d[0], d[1], f"stage{i}") for i, d in enumerate(self.down_factors)]
        if len(priors) == 1:
            ctx = priors[0]
        else:
            ctx = jnp.concatenate(priors, axis=-1)
            x = nn.Conv(len(priors) * self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="up_conv")(x)
            x = nn.relu(_bn(train, self.dtype, "up_bn")(x))
        out = jnp.concatenate([x, ctx], axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(out)
        out = nn.relu(_bn(train, self.dtype, "bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class EdgeModule(nn.Module):
    """edge_block.py: multi-scale edge features + shared edge classifier."""

    mid_fea: int = 256
    out_fea: int = 2
    factor: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, x3, train=False):
        h, w = x1.shape[1:3]
        conv4 = nn.Conv(self.out_fea, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, name="conv4")
        f1 = _conv_bn_relu(x1, self.mid_fea, 1, train, self.dtype, "conv1", bias=False)
        e1 = conv4(f1)
        f2 = _conv_bn_relu(x2, self.mid_fea, 1, train, self.dtype, "conv2", bias=False)
        e2 = conv4(f2)
        f3 = _conv_bn_relu(x3, self.mid_fea, 1, train, self.dtype, "conv3", bias=False)
        e3 = conv4(f3)
        up = lambda v: resize(v, (h, w), method="bilinear", align_corners=True)
        edge_fea = jnp.concatenate([f1, up(f2), up(f3)], axis=-1)
        edge = jnp.concatenate([e1, up(e2), up(e3)], axis=-1)
        edge = nn.Conv(self.out_fea, (1, 1), dtype=self.dtype, name="conv5")(edge)
        return edge, edge_fea


class CE2PDecoderModule(nn.Module):
    """decoder_block.py CE2P_Decoder_Module."""

    num_classes: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xt, xl, train=False):
        h, w = xl.shape[1:3]
        xt = _conv_bn_relu(xt, 256, 1, train, self.dtype, "conv1", bias=False)
        xt = resize(xt, (h, w), method="bilinear", align_corners=True)
        xl = _conv_bn_relu(xl, 48, 1, train, self.dtype, "conv2", bias=False)
        x = jnp.concatenate([xt, xl], axis=-1)
        x = _conv_bn_relu(x, 256, 1, train, self.dtype, "conv3a", bias=False)
        x = _conv_bn_relu(x, 256, 1, train, self.dtype, "conv3b", bias=False)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        seg = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="conv4")(x)
        return seg, x


def offset_sample(x, offset):
    """offset_block.py OffsetBlock: sample features at coord + offset with
    border padding (F.grid_sample semantics, align_corners default=True in
    torch<=1.2 era openseg usage). x: (B,H,W,C); offset: (B,H,W,2) (dy,dx)."""
    b, h, w, c = x.shape
    ys = jnp.arange(h, dtype=x.dtype)[None, :, None] + offset[..., 0]
    xs = jnp.arange(w, dtype=x.dtype)[None, None, :] + offset[..., 1]
    ys = jnp.clip(ys, 0.0, h - 1.0)  # border padding
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    out = 0.0
    for dy, wy_ in ((0, 1 - wy), (1, wy)):
        for dx, wx_ in ((0, 1 - wx), (1, wx)):
            yi = jnp.clip((y0 + dy).astype(jnp.int32), 0, h - 1)
            xi = jnp.clip((x0 + dx).astype(jnp.int32), 0, w - 1)
            bidx = jnp.arange(b).reshape(b, 1, 1)
            out = out + x[bidx, yi, xi] * (wy_ * wx_)[..., None]
    return out


# --------------------------------------------------------------------- nets


class _ResNetNet(nn.Module):
    """Shared skeleton: ResNet-family backbone (default
    deepbase-resnet101-dilated8; any `resnet_zoo.ARCH_SPECS` name, mirroring
    the configer-driven BackboneSelector) + dsn head on layer3 + a main head
    on layer4; both upsampled to input size."""

    num_classes: int = 1
    backbone: str = "deepbase_resnet101_dilated8"
    dtype: Any = jnp.float32

    def backbone_feats(self, x, train):
        return ResNetZooBackbone(arch=self.backbone, dtype=self.dtype,
                                 name="backbone")(x, train)

    def dsn(self, f, train, dropout=0.05):
        f = _conv_bn_relu(f, 512, 3, train, self.dtype, "dsn", bias=True)
        f = nn.Dropout(dropout, deterministic=not train)(f)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="dsn_cls")(f)


class SpatialOCRNet(_ResNetNet):
    """nets/ocrnet.py:19-67."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        x_dsn = self.dsn(x3, train)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "conv_3x3", bias=True)
        ctx = SpatialGather()(f, x_dsn)
        f = SpatialOCR(256, 512, dtype=self.dtype, name="spatial_ocr_head")(f, ctx, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(x_dsn), up(out)


class ASPOCRNet(_ResNetNet):
    """nets/ocrnet.py:70-111."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        x_dsn = self.dsn(x3, train, dropout=0.1)
        f = SpatialOCRASPModule(256, 256, dtype=self.dtype,
                                name="asp_ocr_head")(x4, x_dsn, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(x_dsn), up(out)


class FcnNet(_ResNetNet):
    """nets/fcnet.py:21-71 (the resnet channel configuration)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        aux = _conv_bn_relu(x3, 512, 3, train, self.dtype, "dsn_head", bias=True)
        aux = nn.Dropout(0.1, deterministic=not train)(aux)
        aux = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="dsn_cls")(aux)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "cls_head", bias=True)
        f = nn.Dropout(0.1, deterministic=not train)(f)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype, name="cls")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(aux), up(out)


class BaseOCNet(_ResNetNet):
    """nets/ocnet.py:18-63."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        aux = _conv_bn_relu(x3, 512, 3, train, self.dtype, "dsn", bias=True)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="dsn_cls")(aux)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "oc_module_pre", bias=True)
        f = BaseOCModule(256, 256, 512, dtype=self.dtype, name="oc_module")(f, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(aux), up(out)


class AspOCNet(_ResNetNet):
    """nets/ocnet.py:66-100."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        aux = _conv_bn_relu(x3, 512, 3, train, self.dtype, "dsn", bias=True)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="dsn_cls")(aux)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "context_pre", bias=True)
        f = ASPOCModule(256, dtype=self.dtype, name="context")(f, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(aux), up(out)


class ISANet(_ResNetNet):
    """nets/isanet.py (down_factors from the config; default ((8,8),))."""

    down_factors: Sequence[Sequence[int]] = ((8, 8),)

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        aux = _conv_bn_relu(x3, 512, 3, train, self.dtype, "dsn", bias=False)
        aux = nn.Dropout(0.05, deterministic=not train)(aux)
        aux = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="dsn_cls")(aux)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "isa_pre", bias=False)
        f = ISAModule(256, 512, 512, self.down_factors, dropout=0.05,
                      dtype=self.dtype, name="isa_head")(f, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls_head")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(aux), up(out)


class CE2POCRNet(_ResNetNet):
    """nets/ce2pnet.py CE2P_OCRNet (resnet config): OCR context + edge module
    + CE2P decoder; returns (seg1, edge, seg_dsn, seg2) like the torch net."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        hw = x.shape[1:3]
        x1, x2, x3, x4 = self.backbone_feats(x, train)
        seg_dsn = self.dsn(x3, train, dropout=0.1)
        edge_out, edge_fea = EdgeModule(256, 2, dtype=self.dtype, name="edgelayer")(
            x1, x2, x3, train)
        ctx = SpatialGather()(x4, seg_dsn)
        x_hr = SpatialOCR(256, 512, dropout=0.05, dtype=self.dtype,
                          name="spatial_ocr_head")(x4, ctx, train)
        seg_out1, x_hr = CE2PDecoderModule(self.num_classes, dtype=self.dtype,
                                           name="decoder")(x_hr, x1, train)
        x_hr = jnp.concatenate(
            [resize(x_hr, edge_fea.shape[1:3], method="bilinear", align_corners=True),
             edge_fea], axis=-1)
        x_hr = _conv_bn_relu(x_hr, 256, 1, train, self.dtype, "cls_pre", bias=False)
        seg_out2 = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls")(x_hr)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(seg_out1), up(edge_out), up(seg_dsn), up(seg_out2)


def _label_to_feature_grid(label, num_classes, fh, fw):
    """One-hot the GT and nearest-downsample it to the feature grid
    (F.interpolate mode='nearest' of the label map)."""
    if label.ndim == 3:
        label = jax.nn.one_hot(label, num_classes)
    ys = jnp.arange(fh) * label.shape[1] // fh
    xs = jnp.arange(fw) * label.shape[2] // fw
    return label[:, ys][:, :, xs]  # (B, fh, fw, K)


def _gt_gather(f, onehot_ds):
    """SpatialGather_Module(use_gt=True): L1-normalised hard assignment
    (spatial_ocr_block.py label branch). f: (B,H,W,C) -> (B,K,C)."""
    b, h, w, c = f.shape
    k = onehot_ds.shape[-1]
    p = onehot_ds.reshape(b, h * w, k).astype(f.dtype)
    p = jnp.moveaxis(p, -1, 1)  # (b, k, hw)
    p = p / jnp.maximum(jnp.sum(jnp.abs(p), axis=2, keepdims=True), 1e-12)
    return jnp.einsum("bkn,bnc->bkc", p, f.reshape(b, h * w, c))


class ObjectAttentionGT(nn.Module):
    """ObjectAttentionBlock2D(use_gt=True[, use_bg]): the similarity map is
    the L1-normalised one-hot label (and its complement for the background
    context) instead of learned query-key attention; value/f_up transforms
    stay learned (spatial_ocr_block.py use_gt branch)."""

    key_channels: int
    use_bg: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, proxy, onehot_ds, train=False):
        b, h, w, c = x.shape
        kc = self.key_channels

        def conv_bn_relu(v, ch, name, twice=False):
            v = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_conv0")(v)
            v = nn.relu(_bn(train, self.dtype, f"{name}_bn0")(v))
            if twice:
                v = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_conv1")(v)
                v = nn.relu(_bn(train, self.dtype, f"{name}_bn1")(v))
            return v

        value = conv_bn_relu(proxy[:, None], kc, "f_down")[:, 0]  # (b, k, kc)
        # f_up is shared between the object and background contexts, so its
        # submodules are created once and applied twice
        f_up_conv = nn.Conv(c, (1, 1), dtype=self.dtype, name="f_up_conv0")
        f_up_bn = _bn(train, self.dtype, "f_up_bn0")
        f_up = lambda v: nn.relu(f_up_bn(f_up_conv(v)))

        sim = onehot_ds.reshape(b, h * w, -1).astype(x.dtype)
        simn = sim / jnp.maximum(jnp.sum(jnp.abs(sim), axis=-1, keepdims=True), 1e-12)
        ctx = jnp.einsum("bnk,bkc->bnc", simn, value).reshape(b, h, w, kc)
        ctx = f_up(ctx)
        if not self.use_bg:
            return ctx, None
        bg = 1.0 - sim
        bgn = bg / jnp.maximum(jnp.sum(jnp.abs(bg), axis=-1, keepdims=True), 1e-12)
        bg_ctx = jnp.einsum("bnk,bkc->bnc", bgn, value).reshape(b, h, w, kc)
        bg_ctx = f_up(bg_ctx)
        return ctx, bg_ctx


class SpatialOCRGT(nn.Module):
    """SpatialOCR_Module(use_gt=True[, use_bg, use_oc]) concat-project."""

    key_channels: int
    out_channels: int
    use_bg: bool = False
    use_oc: bool = True
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, proxy, onehot_ds, train=False):
        ctx, bg_ctx = ObjectAttentionGT(self.key_channels, self.use_bg,
                                        dtype=self.dtype, name="oab")(
            feats, proxy, onehot_ds, train)
        if self.use_bg:
            parts = ([ctx, bg_ctx, feats] if self.use_oc else [bg_ctx, feats])
        else:
            parts = [ctx, feats]
        out = jnp.concatenate(parts, axis=-1)
        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv")(out)
        out = nn.relu(_bn(train, self.dtype, "bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _IdealOCRBase(_ResNetNet):
    """Shared skeleton of the ideal_ocrnet.py research probes:
    backbone -> dsn -> conv3x3 -> (gather, distribute) -> head."""

    gt_gather: bool = True      # SpatialGather use_gt
    gt_distribute: bool = True  # SpatialOCR use_gt
    use_bg: bool = False
    use_oc: bool = True

    @nn.compact
    def __call__(self, x, label, train: bool = False):
        hw = x.shape[1:3]
        _, _, x3, x4 = self.backbone_feats(x, train)
        x_dsn = self.dsn(x3, train)
        f = _conv_bn_relu(x4, 512, 3, train, self.dtype, "conv_3x3", bias=True)
        onehot = _label_to_feature_grid(label, self.num_classes, *f.shape[1:3])
        if self.gt_gather:
            ctx = _gt_gather(f, onehot)
        else:
            ctx = SpatialGather()(f, x_dsn)
        if self.gt_distribute:
            f = SpatialOCRGT(256, 512, self.use_bg, self.use_oc, dtype=self.dtype,
                             name="spatial_ocr_head")(f, ctx, onehot, train)
        else:
            f = SpatialOCR(256, 512, dtype=self.dtype, name="spatial_ocr_head")(f, ctx, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="head")(f)
        up = lambda v: resize(v, hw, method="bilinear", align_corners=True)
        return up(x_dsn), up(out)


class IdealSpatialOCRNet(_IdealOCRBase):
    """ideal_ocrnet.py:19-67: GT gather + GT distribute."""


class IdealSpatialOCRNetB(_IdealOCRBase):
    """ideal_ocrnet.py:69-118: + GT background context."""

    use_bg: bool = True


class IdealSpatialOCRNetC(_IdealOCRBase):
    """ideal_ocrnet.py:120-170: background context only (use_oc=False)."""

    use_bg: bool = True
    use_oc: bool = False


class IdealGatherOCRNet(_IdealOCRBase):
    """ideal_ocrnet.py:172-217: GT gather, learned distribute."""

    gt_distribute: bool = False


class IdealDistributeOCRNet(_IdealOCRBase):
    """ideal_ocrnet.py:219-263: learned gather, GT distribute."""

    gt_gather: bool = False


class SegFixHRNet(nn.Module):
    """nets/segfix.py: HRNet backbone, concat-upsampled features, mask +
    direction heads (DTOffsetConfig.num_classes=8 directions by default)."""

    num_directions: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = HRNetW48Backbone(dtype=self.dtype, name="backbone")(x, train)
        h, w = xs[0].shape[1:3]
        feats = jnp.concatenate(
            [xs[0]] + [resize(t, (h, w), method="bilinear", align_corners=True)
                       for t in xs[1:]], axis=-1)

        def head(v, out_ch, name):
            v = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_conv0")(v)
            v = nn.relu(_bn(train, self.dtype, f"{name}_bn")(v))
            return nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                           name=f"{name}_conv1")(v)

        mask_map = head(feats, 2, "mask_head")
        dir_map = head(feats, self.num_directions, "dir_head")
        return mask_map, dir_map


# ----------------------------------------------------- SegFix refinement


def direction_offsets(num_directions: int = 8, scale: float = 1.0) -> jnp.ndarray:
    """(num_directions, 2) integer-ish (dy, dx) steps, one per direction
    class: angle k*360/num -> (sin, cos) rounded to the unit grid step (the
    openseg DTOffsetHelper.label_to_vector convention; its offset_helper
    module is not vendored in the reference, so the mapping is derived from
    the angle formula). For num=8: (0,1),(1,1),(1,0),(1,-1),(0,-1),(-1,-1),
    (-1,0),(-1,1). Only num in {4, 8} round to DISTINCT unit steps (16+
    would alias 22.5-degree directions onto their neighbours), so larger
    values are rejected rather than silently mis-mapped."""
    import numpy as np

    if num_directions not in (4, 8):
        raise ValueError(
            f"direction_offsets: num_directions={num_directions} not supported "
            "(only 4 or 8 map to distinct unit grid steps; the reference "
            "SegFix heads use 8)"
        )
    ang = np.arange(num_directions) * (2.0 * np.pi / num_directions)
    dy = np.round(np.sin(ang))
    dx = np.round(np.cos(ang))
    return jnp.asarray(np.stack([dy, dx], axis=-1) * scale, jnp.float32)


def segfix_refine(seg_label, mask_logits, dir_logits, *, iterations: int = 1,
                  mask_threshold: float = 0.5):
    """The SegFix offset refinement (openseg `scripts/segfix.py` procedure,
    consuming the SegFix_HRNet heads of `nets/segfix.py:77-89`): pixels the
    boundary-mask head flags are re-labelled from the pixel one direction
    step toward the object interior, as predicted by the direction head.
    Iterating pushes labels a few pixels in from the boundary.

    seg_label: (B, H, W) int class map (or (B,H,W,1));
    mask_logits: (B, H, W, 2) boundary-vs-interior head output;
    dir_logits: (B, H, W, D) direction head output.
    Returns the refined (B, H, W) label map. Pure/jittable.
    """
    if seg_label.ndim == 4:
        seg_label = seg_label[..., 0]
    b, h, w = seg_label.shape
    if mask_logits.shape[1:3] != (h, w):
        mask_logits = resize(mask_logits, (h, w), method="bilinear", align_corners=True)
    if dir_logits.shape[1:3] != (h, w):
        dir_logits = resize(dir_logits, (h, w), method="bilinear", align_corners=True)
    boundary = jax.nn.softmax(mask_logits, axis=-1)[..., 1] > mask_threshold
    dir_idx = jnp.argmax(dir_logits, axis=-1)  # (B, H, W)
    offs = direction_offsets(dir_logits.shape[-1])  # (D, 2)
    step = offs[dir_idx]  # (B, H, W, 2)

    ys0 = jnp.arange(h)[None, :, None]
    xs0 = jnp.arange(w)[None, None, :]
    bidx = jnp.arange(b).reshape(b, 1, 1)

    label = seg_label
    for _ in range(iterations):
        yi = jnp.clip(ys0 + step[..., 0].astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(xs0 + step[..., 1].astype(jnp.int32), 0, w - 1)
        moved = label[bidx, yi, xi]
        label = jnp.where(boundary, moved, label)
    return label


# ------------------------------------------------- model manager (registry)

# mirrors `hrnet_ocr/model_manager.py:44-73` SEG_MODEL_DICT; every entry is
# constructible by name with (num_classes=..., dtype=...).
SEG_MODEL_DICT = {
    "segfix_hrnet": SegFixHRNet,
    "base_ocnet": BaseOCNet,
    "asp_ocnet": AspOCNet,
    "isanet": ISANet,
    "spatial_ocrnet": SpatialOCRNet,
    "spatial_asp_ocrnet": ASPOCRNet,
    "ideal_spatial_ocrnet": IdealSpatialOCRNet,
    "ideal_spatial_ocrnet_b": IdealSpatialOCRNetB,
    "ideal_spatial_ocrnet_c": IdealSpatialOCRNetC,
    "ideal_gather_ocrnet": IdealGatherOCRNet,
    "ideal_distribute_ocrnet": IdealDistributeOCRNet,
    "ce2p_ocrnet": CE2POCRNet,
    "fcnet": FcnNet,
}


def semantic_segmentor(model_name: str, **kwargs):
    """ModelManager.semantic_segmentor (`model_manager.py:76-88`): construct
    an openseg net by its registry name.

    The hrnet_* rows resolve to models/hrnet_ocr.py: 'hrnet_w48_ocr' is the
    CSBSR-integrated HRNetW48OCR (the one entry the reference CSBSR imports);
    'hrnet_w48' / 'hrnet_w48_aspocr' / 'hrnet_w48_ocr_b' are its dormant
    siblings from `nets/hrnet.py:22,56,161` (imported by
    `build_model.py:23` but never instantiated there).
    """
    hrnet_names = {"hrnet_w48_ocr": "HRNetW48OCR", "hrnet_w48": "HRNetW48",
                   "hrnet_w48_aspocr": "HRNetW48ASPOCR",
                   "hrnet_w48_ocr_b": "HRNetW48OCRB"}
    if model_name in hrnet_names:
        from . import hrnet_ocr

        return getattr(hrnet_ocr, hrnet_names[model_name])(**kwargs)
    if model_name not in SEG_MODEL_DICT:
        raise KeyError(
            f"Model: {model_name} not valid! options: "
            f"{sorted(SEG_MODEL_DICT) + sorted(hrnet_names)}"
        )
    if model_name == "segfix_hrnet":
        kwargs.pop("num_classes", None)  # SegFix has mask+dir heads instead
    return SEG_MODEL_DICT[model_name](**kwargs)
