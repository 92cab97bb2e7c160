"""HRNetV2-W48 + OCR segmentation head.

Rebuild of `/root/reference/model/modeling/hrnet_ocr/` on NHWC flax:
  - backbone: stem (2x stride-2 conv) -> layer1 (4x Bottleneck-64) ->
    3 multi-resolution stages of HighResolutionModules with SUM fusion
    (branch channels 48/96/192/384; modules 1/4/3; 4 BasicBlocks per branch:
    `backbones/hrnet/hrnet_backbone.py:108-295,295-560`,
    `hrnet_config.py:52-73`)
  - OCR head: concat of the 4 branch maps upsampled (bilinear,
    align_corners=True) to 1/4 res (720 ch) -> aux head -> SpatialGather
    (class-probability-weighted context) -> SpatialOCR (object attention) ->
    1x1 cls head; both outputs upsampled to input size + sigmoid
    (`nets/hrnet.py:101-158`, `modules/spatial_ocr_block.py:37-305`).

bn_type is 'torchbn' on the shipped path (`config/H_48_D_4_composite.json:81`)
=> plain BatchNorm; under a sharded batch the stats are global (SyncBN-free).
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize
from .blocks import qconv

def hrnet_stages(width: int):
    """hrnet_config.py: hrnet18/32/48/64 share one topology - branch
    channels (w, 2w, 4w, 8w), modules 1/4/3, 4 BasicBlocks per branch.
    (hrnet2x20 / HighResolutionNext is a structurally different
    experimental net upstream - 2 stem branches, 5 stage-4 branches - and
    is not rebuilt; no reference recipe selects it.)"""
    return {
        "stage2": dict(num_modules=1, num_branches=2, num_blocks=4,
                       channels=(width, width * 2)),
        "stage3": dict(num_modules=4, num_branches=3, num_blocks=4,
                       channels=(width, width * 2, width * 4)),
        "stage4": dict(num_modules=3, num_branches=4, num_blocks=4,
                       channels=(width, width * 2, width * 4, width * 8)),
    }


W48_STAGES = hrnet_stages(48)


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


def _conv(ch, k, s, p, dtype, name, bias=False, train=False):
    return qconv(ch, k, stride=s, padding=p, use_bias=bias, dtype=dtype,
                 name=name, train=train)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out = _conv(self.planes, 3, self.stride, 1, self.dtype, "conv1", train=train)(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = _conv(self.planes, 3, 1, 1, self.dtype, "conv2", train=train)(out)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.use_downsample:
            res = _conv(self.planes, 1, self.stride, 0, self.dtype, "ds_conv", train=train)(x)
            res = _bn(train, self.dtype, "ds_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out = _conv(self.planes, 1, 1, 0, self.dtype, "conv1", train=train)(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = _conv(self.planes, 3, self.stride, 1, self.dtype, "conv2", train=train)(out)
        out = nn.relu(_bn(train, self.dtype, "bn2")(out))
        out = _conv(self.planes * 4, 1, 1, 0, self.dtype, "conv3", train=train)(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.use_downsample:
            res = _conv(self.planes * 4, 1, self.stride, 0, self.dtype, "ds_conv", train=train)(x)
            res = _bn(train, self.dtype, "ds_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class HighResolutionModule(nn.Module):
    """hrnet_backbone.py:108-288: parallel branches + SUM fusion."""

    channels: Sequence[int]
    num_blocks: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train=False):
        n = len(self.channels)
        outs = []
        for i, x in enumerate(xs):
            for b in range(self.num_blocks):
                use_ds = b == 0 and x.shape[-1] != self.channels[i]
                x = BasicBlock(self.channels[i], 1, use_ds, dtype=self.dtype,
                               name=f"branch{i}_block{b}")(x, train)
            outs.append(x)

        fused = []
        for i in range(n):
            y = None
            h, w = outs[i].shape[1:3]
            for j in range(n):
                if j == i:
                    t = outs[j]
                elif j > i:
                    # 1x1 conv + BN then bilinear upsample (align_corners=True)
                    t = _conv(self.channels[i], 1, 1, 0, self.dtype, f"fuse{i}_{j}_conv", train=train)(outs[j])
                    t = _bn(train, self.dtype, f"fuse{i}_{j}_bn")(t)
                    t = resize(t, (h, w), method="bilinear", align_corners=True)
                else:
                    # (i-j) strided 3x3 convs; intermediate keep channels+ReLU
                    t = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        t = _conv(ch, 3, 2, 1, self.dtype, f"fuse{i}_{j}_conv{k}", train=train)(t)
                        t = _bn(train, self.dtype, f"fuse{i}_{j}_bn{k}")(t)
                        if not last:
                            t = nn.relu(t)
                y = t if y is None else y + t
            fused.append(nn.relu(y))
        return fused


class HRNetW48Backbone(nn.Module):
    """hrnet_backbone.py:295-560.  `width` selects the hrnet18/32/48/64
    config row (hrnet_config.py MODEL_CONFIGS); the default 48 is the
    CSBSR-shipped backbone, hence the class name."""

    dtype: Any = jnp.float32
    width: int = 48

    @nn.compact
    def __call__(self, x, train=False):
        stages = hrnet_stages(self.width)
        x = _conv(64, 3, 2, 1, self.dtype, "conv1", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = _conv(64, 3, 2, 1, self.dtype, "conv2", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "bn2")(x))
        for b in range(4):
            x = Bottleneck(64, 1, b == 0, dtype=self.dtype, name=f"layer1_{b}")(x, train)

        def transition(xs, cur_channels, name):
            """hrnet_backbone.py:411-459."""
            outs = []
            npre = len(xs)
            for i, ch in enumerate(cur_channels):
                if i < npre:
                    if xs[i].shape[-1] != ch:
                        t = _conv(ch, 3, 1, 1, self.dtype, f"{name}_{i}_conv", train=train)(xs[i])
                        t = nn.relu(_bn(train, self.dtype, f"{name}_{i}_bn")(t))
                        outs.append(t)
                    else:
                        outs.append(xs[i])
                else:
                    t = xs[-1]
                    for j in range(i + 1 - npre):
                        ch_out = ch if j == i - npre else t.shape[-1]
                        t = _conv(ch_out, 3, 2, 1, self.dtype, f"{name}_{i}_conv{j}", train=train)(t)
                        t = nn.relu(_bn(train, self.dtype, f"{name}_{i}_bn{j}")(t))
                    outs.append(t)
            return outs

        xs = transition([x], stages["stage2"]["channels"], "transition1")
        for m in range(stages["stage2"]["num_modules"]):
            xs = HighResolutionModule(stages["stage2"]["channels"], dtype=self.dtype,
                                      name=f"stage2_m{m}")(xs, train)
        xs = transition(xs, stages["stage3"]["channels"], "transition2")
        for m in range(stages["stage3"]["num_modules"]):
            xs = HighResolutionModule(stages["stage3"]["channels"], dtype=self.dtype,
                                      name=f"stage3_m{m}")(xs, train)
        xs = transition(xs, stages["stage4"]["channels"], "transition3")
        for m in range(stages["stage4"]["num_modules"]):
            xs = HighResolutionModule(stages["stage4"]["channels"], dtype=self.dtype,
                                      name=f"stage4_m{m}")(xs, train)
        return xs


class SpatialGather(nn.Module):
    """spatial_ocr_block.py:37-67: probability-weighted class context."""

    scale: float = 1.0

    def __call__(self, feats, probs):
        b, h, w, c = feats.shape
        k = probs.shape[-1]
        p = probs.reshape(b, h * w, k)
        p = jnp.moveaxis(p, -1, 1)  # (b, k, hw)
        p = jnp.exp(self.scale * p - jnp.max(self.scale * p, axis=2, keepdims=True))
        p = p / jnp.sum(p, axis=2, keepdims=True)  # softmax over spatial
        f = feats.reshape(b, h * w, c)
        return jnp.einsum("bkn,bnc->bkc", p, f)  # (b, k, c)


class ObjectAttention(nn.Module):
    """spatial_ocr_block.py:114-218 (scale=1 path)."""

    key_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, proxy, train=False):
        b, h, w, c = x.shape
        kc = self.key_channels

        def conv_bn_relu(v, ch, name, twice=False):
            v = qconv(ch, 1, dtype=self.dtype, name=f"{name}_conv0", train=train)(v)
            v = nn.relu(_bn(train, self.dtype, f"{name}_bn0")(v))
            if twice:
                v = qconv(ch, 1, dtype=self.dtype, name=f"{name}_conv1", train=train)(v)
                v = nn.relu(_bn(train, self.dtype, f"{name}_bn1")(v))
            return v

        query = conv_bn_relu(x, kc, "f_pixel", twice=True).reshape(b, h * w, kc)
        # proxy: (b, k, c) treated as k 'pixels'
        proxy_map = proxy[:, None]  # (b, 1, k, c)
        key = conv_bn_relu(proxy_map, kc, "f_object", twice=True)[:, 0]  # (b, k, kc)
        value = conv_bn_relu(proxy_map, kc, "f_down")[:, 0]  # (b, k, kc)

        sim = jnp.einsum("bnc,bkc->bnk", query, key) * (kc**-0.5)
        sim = nn.softmax(sim, axis=-1)
        context = jnp.einsum("bnk,bkc->bnc", sim, value).reshape(b, h, w, kc)
        context = conv_bn_relu(context, c, "f_up")
        return context


class SpatialOCR(nn.Module):
    """spatial_ocr_block.py:235-305."""

    key_channels: int
    out_channels: int
    dropout: float = 0.05
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, proxy, train=False):
        context = ObjectAttention(self.key_channels, dtype=self.dtype, name="oab")(
            feats, proxy, train
        )
        out = jnp.concatenate([context, feats], axis=-1)
        out = qconv(self.out_channels, 1, dtype=self.dtype, name="conv", train=train)(out)
        out = nn.relu(_bn(train, self.dtype, "bn")(out))
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class HRNetW48OCR(nn.Module):
    """nets/hrnet.py:101-158. Returns (main_sigmoid, aux_sigmoid) at input res.

    `width` selects the hrnet18/32/48/64 backbone row; the aux head is
    in_ch->in_ch like the reference (in_ch = 15*width, 720 at W48).
    """

    num_classes: int = 1
    width: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_in, w_in = x.shape[1:3]
        xs = HRNetW48Backbone(width=self.width, dtype=self.dtype, name="backbone")(x, train)
        h, w = xs[0].shape[1:3]
        feats = jnp.concatenate(
            [xs[0]] + [resize(t, (h, w), method="bilinear", align_corners=True) for t in xs[1:]],
            axis=-1,
        )  # (1+2+4+8)*width ch; 720 at W48

        aux = qconv(feats.shape[-1], 3, padding=1, dtype=self.dtype, name="aux_conv0", train=train)(feats)
        aux = nn.relu(_bn(train, self.dtype, "aux_bn")(aux))
        aux = qconv(self.num_classes, 1, dtype=self.dtype, name="aux_conv1", train=train)(aux)

        f = qconv(512, 3, padding=1, dtype=self.dtype, name="conv3x3", train=train)(feats)
        f = nn.relu(_bn(train, self.dtype, "conv3x3_bn")(f))

        context = SpatialGather()(f, aux)
        f = SpatialOCR(256, 512, dtype=self.dtype, name="ocr_distri_head")(f, context, train)
        out = qconv(self.num_classes, 1, dtype=self.dtype, name="cls_head", train=train)(f)

        out = nn.sigmoid(resize(out, (h_in, w_in), method="bilinear", align_corners=True))
        aux = nn.sigmoid(resize(aux, (h_in, w_in), method="bilinear", align_corners=True))
        return out, aux


def _hrnet_feats(x, width, dtype, train):
    """Shared stem of every nets/hrnet.py head: run the backbone, bilinear-
    upsample branches 2-4 to branch-1 resolution, concat -> 15*width ch."""
    xs = HRNetW48Backbone(width=width, dtype=dtype, name="backbone")(x, train)
    h, w = xs[0].shape[1:3]
    return jnp.concatenate(
        [xs[0]] + [resize(t, (h, w), method="bilinear", align_corners=True) for t in xs[1:]],
        axis=-1,
    )


class HRNetW48(nn.Module):
    """nets/hrnet.py:22-53 (plain FCN head): conv3x3(in->in) + BNReLU +
    dropout 0.10 + 1x1 cls conv (no bias), upsampled to input size.
    Single raw-logit output (the reference returns logits here)."""

    num_classes: int = 1
    width: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_in, w_in = x.shape[1:3]
        feats = _hrnet_feats(x, self.width, self.dtype, train)
        f = nn.Conv(feats.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="cls_conv0")(feats)
        f = nn.relu(_bn(train, self.dtype, "cls_bn")(f))
        f = nn.Dropout(0.10, deterministic=not train)(f)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="cls_conv1")(f)
        return resize(out, (h_in, w_in), method="bilinear", align_corners=True)


class HRNetW48ASPOCR(nn.Module):
    """nets/hrnet.py:56-100: aux head (in->512 conv3x3 + BNReLU + 512->K),
    SpatialOCR_ASP_Module(hidden=256, out=256, dilations 24/48/72) over the
    concat feats conditioned on the aux logits, 256->K cls conv (no bias).
    Returns (out_aux, out) logits at input resolution, reference order."""

    num_classes: int = 1
    width: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .openseg import SpatialOCRASPModule

        h_in, w_in = x.shape[1:3]
        feats = _hrnet_feats(x, self.width, self.dtype, train)

        aux = nn.Conv(512, (3, 3), padding=1, dtype=self.dtype, name="aux_conv0")(feats)
        aux = nn.relu(_bn(train, self.dtype, "aux_bn")(aux))
        aux = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="aux_conv1")(aux)

        f = SpatialOCRASPModule(hidden=256, out_features=256, dilations=(24, 48, 72),
                                dtype=self.dtype, name="asp_ocr_head")(feats, aux, train)
        out = nn.Conv(self.num_classes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="cls_head")(f)

        out_aux = resize(aux, (h_in, w_in), method="bilinear", align_corners=True)
        out = resize(out, (h_in, w_in), method="bilinear", align_corners=True)
        return out_aux, out


class HRNetW48OCRB(nn.Module):
    """nets/hrnet.py:161-215 (OCR_B): the cheaper OCR head - 3x3 convs go
    in->256 instead of in->in/512, SpatialOCR(key=128, out=256).
    Returns (out_aux, out) logits at input resolution, reference order."""

    num_classes: int = 1
    width: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h_in, w_in = x.shape[1:3]
        feats = _hrnet_feats(x, self.width, self.dtype, train)

        aux = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="aux_conv0")(feats)
        aux = nn.relu(_bn(train, self.dtype, "aux_bn")(aux))
        aux = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="aux_conv1")(aux)

        f = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv3x3")(feats)
        f = nn.relu(_bn(train, self.dtype, "conv3x3_bn")(f))

        context = SpatialGather()(f, aux)
        f = SpatialOCR(128, 256, dtype=self.dtype, name="ocr_distri_head")(f, context, train)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="cls_head")(f)

        out_aux = resize(aux, (h_in, w_in), method="bilinear", align_corners=True)
        out = resize(out, (h_in, w_in), method="bilinear", align_corners=True)
        return out_aux, out
