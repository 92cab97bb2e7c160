"""DSRL - parallel SR + segmentation baseline (DeepLabV3+).

Rebuild of `/root/reference/model/modeling/DSRL/` (deeplab.py, aspp.py,
decoder.py, sr_decoder.py, backbone/resnet.py): ResNet-101 (output stride
16, multi-grid layer4) -> ASPP -> seg decoder (sigmoid) + SR decoder (64ch)
-> EDSR-style x2/x4 deconv upsample chain.  Returns
(seg, sr, fea_seg, fea_sr) like `deeplab.py:62-80,159-180`.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize, adaptive_avg_pool
from .blocks import qconv


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dilation
        out = qconv(self.planes, 1, use_bias=False, dtype=self.dtype,
                    name="conv1", train=train)(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = qconv(self.planes, 3, stride=self.stride, padding=d, dilation=d,
                    use_bias=False, dtype=self.dtype, name="conv2", train=train)(out)
        out = nn.relu(_bn(train, self.dtype, "bn2")(out))
        out = qconv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                    name="conv3", train=train)(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.use_downsample:
            res = qconv(self.planes * 4, 1, stride=self.stride,
                        use_bias=False, dtype=self.dtype, name="ds_conv",
                        train=train)(x)
            res = _bn(train, self.dtype, "ds_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNet101OS16(nn.Module):
    """backbone/resnet.py:45-147, output_stride=16: strides (1,2,2,1),
    dilations (1,1,1,2), layer4 multi-grid (1,2,4)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = qconv(64, 7, stride=2, padding=3, use_bias=False,
                  dtype=self.dtype, name="conv1", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def layer(x, planes, blocks, stride, dilation, name, grid=None):
            for b in range(blocks):
                s = stride if b == 0 else 1
                d = dilation * (grid[b] if grid else 1)
                use_ds = b == 0 and (s != 1 or x.shape[-1] != planes * 4)
                x = _Bottleneck(planes, s, d, use_ds, dtype=self.dtype,
                                name=f"{name}_{b}")(x, train)
            return x

        x = layer(x, 64, 3, 1, 1, "layer1")
        low = x  # 256ch @ /4
        x = layer(x, 128, 4, 2, 1, "layer2")
        x = layer(x, 256, 23, 2, 1, "layer3")
        x = layer(x, 512, 3, 1, 2, "layer4", grid=(1, 2, 4))
        return x, low


class DRND54(nn.Module):
    """DRN-D-54 backbone (`DSRL/backbone/drn.py:102-235,377-384`):
    arch 'D', Bottleneck layers [1,1,3,4,6,3,1,1], channels
    (16,32,64,128,256,512,512,512); layers 5/6 dilated (2,4), layers 7/8 are
    plain dilated conv stacks. Output stride 8; low-level feature is the
    layer3 output (256ch @ /4) per `deeplab.py:33` + `drn.py:214-217`."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        def conv_layer(x, ch, convs, stride, dilation, name):
            # _make_conv_layers (drn.py:196-206): [conv3x3, BN, relu] * convs
            for i in range(convs):
                s = stride if i == 0 else 1
                x = qconv(ch, 3, stride=s, padding=dilation, dilation=dilation,
                          use_bias=False, dtype=self.dtype,
                          name=f"{name}_conv{i}", train=train)(x)
                x = nn.relu(_bn(train, self.dtype, f"{name}_bn{i}")(x))
            return x

        def bottleneck_layer(x, planes, blocks, stride, dil_pair, name):
            # _make_layer (drn.py:172-194): per-block (first, rest) dilations
            for b in range(blocks):
                s = stride if b == 0 else 1
                d = dil_pair[0] if b == 0 else dil_pair[1]
                use_ds = b == 0 and (s != 1 or x.shape[-1] != planes * 4)
                x = _Bottleneck(planes, s, d, use_ds, dtype=self.dtype,
                                name=f"{name}_{b}")(x, train)
            return x

        x = qconv(16, 7, padding=3, use_bias=False,
                  dtype=self.dtype, name="layer0_conv", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "layer0_bn")(x))
        x = conv_layer(x, 16, 1, 1, 1, "layer1")
        x = conv_layer(x, 32, 1, 2, 1, "layer2")
        x = bottleneck_layer(x, 64, 3, 2, (1, 1), "layer3")
        low = x  # 256ch @ /4
        x = bottleneck_layer(x, 128, 4, 2, (1, 1), "layer4")
        x = bottleneck_layer(x, 256, 6, 1, (2, 2), "layer5")
        x = bottleneck_layer(x, 512, 3, 1, (4, 4), "layer6")
        x = conv_layer(x, 512, 1, 1, 2, "layer7")
        x = conv_layer(x, 512, 1, 1, 1, "layer8")
        return x, low


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """backbone/mobilenet.py:25-67: MobileNetV2 block with fixed_padding on
    the depthwise conv (symmetric for k=3: pad = dilation each side)."""

    out_ch: int
    stride: int = 1
    dilation: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        d = self.dilation
        h = x
        if self.expand_ratio != 1:
            h = qconv(hidden, 1, use_bias=False, dtype=self.dtype, name="pw",
                      train=train)(h)
            h = _relu6(_bn(train, self.dtype, "pw_bn")(h))
        # fully-depthwise conv: VPU-bound, int8 buys nothing - stays nn.Conv
        h = nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(d, d)] * 2, kernel_dilation=(d, d),
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="dw")(h)
        h = _relu6(_bn(train, self.dtype, "dw_bn")(h))
        h = qconv(self.out_ch, 1, use_bias=False, dtype=self.dtype,
                  name="pw_linear", train=train)(h)
        h = _bn(train, self.dtype, "pw_linear_bn")(h)
        if self.stride == 1 and inp == self.out_ch:
            return x + h
        return h


class MobileNetV2OS16(nn.Module):
    """backbone/mobilenet.py:70-123 at output_stride 16: low-level feature
    after features[0:4] (24ch @ /4), high-level 320ch @ /16 (the last two
    stages run dilated at stride 1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = qconv(32, 3, stride=2, padding=1, use_bias=False,
                  dtype=self.dtype, name="stem_conv", train=train)(x)
        x = _relu6(_bn(train, self.dtype, "stem_bn")(x))
        # (t, c, n, s) rows; dilations per the current_stride walk at os=16
        settings = [
            (1, 16, 1, 1, 1), (6, 24, 2, 2, 1), (6, 32, 3, 2, 1),
            (6, 64, 4, 2, 1), (6, 96, 3, 1, 1), (6, 160, 3, 1, 1),
            (6, 320, 1, 1, 2),
        ]
        low = None
        idx = 0
        for t, c, n, s, d in settings:
            for i in range(n):
                x = InvertedResidual(c, s if i == 0 else 1, d, t, dtype=self.dtype,
                                     name=f"ir{idx}")(x, train)
                idx += 1
                if idx == 3:  # features[0:4] = stem + 3 blocks (mobilenet.py:115)
                    low = x
        return x, low


class SeparableConv(nn.Module):
    """backbone/xception.py:17-31: depthwise (with BN) + pointwise."""

    out_ch: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        d = self.dilation
        inp = x.shape[-1]
        # fully-depthwise conv: VPU-bound, int8 buys nothing - stays nn.Conv
        x = nn.Conv(inp, (3, 3), strides=(self.stride, self.stride),
                    padding=[(d, d)] * 2, kernel_dilation=(d, d),
                    feature_group_count=inp, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        x = _bn(train, self.dtype, "dw_bn")(x)
        return qconv(self.out_ch, 1, use_bias=False, dtype=self.dtype,
                     name="pointwise", train=train)(x)


class XceptionBlock(nn.Module):
    """backbone/xception.py:34-92."""

    planes: int
    reps: int
    stride: int = 1
    dilation: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    is_last: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        inp = x.shape[-1]
        h = x
        ops = []  # (relu_before, out_ch, stride, dilation)
        filters = inp
        if self.grow_first:
            ops.append((True, self.planes, 1, self.dilation))
            filters = self.planes
        for _ in range(self.reps - 1):
            ops.append((True, filters, 1, self.dilation))
        if not self.grow_first:
            ops.append((True, self.planes, 1, self.dilation))
        if self.stride != 1:
            ops.append((True, self.planes, 2, 1))
        if self.stride == 1 and self.is_last:
            ops.append((True, self.planes, 1, 1))
        for i, (pre_relu, ch, s, d) in enumerate(ops):
            if pre_relu and not (i == 0 and not self.start_with_relu):
                h = nn.relu(h)
            h = SeparableConv(ch, s, d, dtype=self.dtype, name=f"sep{i}")(h, train)
            h = _bn(train, self.dtype, f"sep{i}_bn")(h)
        if self.planes != inp or self.stride != 1:
            skip = qconv(self.planes, 1, stride=self.stride,
                         use_bias=False, dtype=self.dtype, name="skip",
                         train=train)(x)
            skip = _bn(train, self.dtype, "skip_bn")(skip)
        else:
            skip = x
        return h + skip


class AlignedXceptionOS16(nn.Module):
    """backbone/xception.py:94-215 at output_stride 16: entry (strides
    2,2,2,2), 16 middle blocks, exit block + 3 separable convs dilated 2.
    Low-level feature = relu(block1) (128ch @ /4)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        blk = lambda planes, reps, name, **kw: XceptionBlock(
            planes, reps, dtype=self.dtype, name=name, **kw)
        x = qconv(32, 3, stride=2, padding=1, use_bias=False,
                  dtype=self.dtype, name="conv1", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "bn1")(x))
        x = qconv(64, 3, padding=1, use_bias=False,
                  dtype=self.dtype, name="conv2", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "bn2")(x))
        x = blk(128, 2, "block1", stride=2, start_with_relu=False)(x, train)
        x = nn.relu(x)
        low = x
        x = blk(256, 2, "block2", stride=2, start_with_relu=False)(x, train)
        x = blk(728, 2, "block3", stride=2, is_last=True)(x, train)
        for i in range(4, 20):
            x = blk(728, 3, f"block{i}")(x, train)
        x = blk(1024, 2, "block20", stride=1, dilation=1, grow_first=False,
                is_last=True)(x, train)
        for i, ch in ((3, 1536), (4, 1536), (5, 2048)):
            x = SeparableConv(ch, 1, 2, dtype=self.dtype, name=f"conv{i}")(x, train)
            x = nn.relu(_bn(train, self.dtype, f"bn{i}")(x))
        return x, low


class ASPP(nn.Module):
    """aspp.py:34-95 (os16: rates 1,6,12,18; os8/drn: 1,12,24,36; + image
    pooling)."""

    output_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        outs = []
        rates = (6, 12, 18) if self.output_stride == 16 else (12, 24, 36)
        for i, (k, d) in enumerate([(1, 1)] + [(3, r) for r in rates]):
            p = (k // 2) * d
            a = qconv(256, k, padding=p, dilation=d,
                      use_bias=False, dtype=self.dtype, name=f"aspp{i+1}_conv",
                      train=train)(x)
            outs.append(nn.relu(_bn(train, self.dtype, f"aspp{i+1}_bn")(a)))
        g = adaptive_avg_pool(x, (1, 1))
        g = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype, name="gap_conv")(g)
        g = nn.relu(_bn(train, self.dtype, "gap_bn")(g))
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], x.shape[2], 256))
        out = jnp.concatenate(outs + [g], axis=-1)
        out = qconv(256, 1, use_bias=False, dtype=self.dtype, name="conv1",
                    train=train)(out)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        return nn.Dropout(0.5, deterministic=not train)(out)


class _Decoder(nn.Module):
    """decoder.py / sr_decoder.py (they share structure; the SR variant ends
    in 64 channels, the seg variant in num_classes + sigmoid)."""

    out_channels: int
    mid2: int
    sigmoid_out: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, low, train=False):
        low = qconv(48, 1, use_bias=False, dtype=self.dtype, name="conv1",
                    train=train)(low)
        low = nn.relu(_bn(train, self.dtype, "bn1")(low))
        x = resize(x, low.shape[1:3], method="bilinear", align_corners=True)
        x = jnp.concatenate([x, low], axis=-1)
        x = qconv(256, 3, padding=1, use_bias=False, dtype=self.dtype,
                  name="last0", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "last0_bn")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = qconv(self.mid2, 3, padding=1, use_bias=False,
                  dtype=self.dtype, name="last1", train=train)(x)
        x = nn.relu(_bn(train, self.dtype, "last1_bn")(x))
        x = nn.Dropout(0.1, deterministic=not train)(x)
        x = qconv(self.out_channels, 1, dtype=self.dtype, name="last2",
                  train=train)(x)
        return nn.sigmoid(x) if self.sigmoid_out else x


class _EDSRConv(nn.Module):
    """deeplab.py:10-26."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = qconv(self.out_ch, 3, padding=1, dtype=self.dtype, name="conv0",
                  train=train)(x)
        y = nn.relu(y)
        y = qconv(self.out_ch, 3, padding=1, dtype=self.dtype, name="conv1",
                  train=train)(y)
        res = qconv(self.out_ch, 1, use_bias=False, dtype=self.dtype,
                    name="res", train=train)(x)
        return y + res


class DSRL(nn.Module):
    """deeplab.py DeepLab/DeepLabx4: scale_factor 2 or 4 deconv chain.

    Returns (seg, sr, fea_seg, fea_sr) at scale_factor * input resolution.
    """

    num_classes: int = 1
    scale_factor: int = 4
    # 'resnet' (ResNet101-OS16) | 'drn' (DRN-D-54, OS8) | 'mobilenet'
    # (MobileNetV2, OS16) | 'xception' (AlignedXception, OS16)
    backbone: str = "resnet"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        if self.backbone == "drn":
            # deeplab.py:29-33: drn forces output_stride 8
            feats, low = DRND54(dtype=self.dtype, name="backbone")(x, train)
            os = 8
        elif self.backbone == "mobilenet":
            feats, low = MobileNetV2OS16(dtype=self.dtype, name="backbone")(x, train)
            os = 16
        elif self.backbone == "xception":
            feats, low = AlignedXceptionOS16(dtype=self.dtype, name="backbone")(x, train)
            os = 16
        else:
            feats, low = ResNet101OS16(dtype=self.dtype, name="backbone")(x, train)
            os = 16
        a = ASPP(output_stride=os, dtype=self.dtype, name="aspp")(feats, train)
        seg = _Decoder(self.num_classes, 256, True, dtype=self.dtype, name="decoder")(a, low, train)
        sr = _Decoder(64, 128, False, dtype=self.dtype, name="sr_decoder")(a, low, train)

        out_hw = (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor)
        seg_up = resize(seg, x.shape[1:3], method="bilinear", align_corners=True)
        seg_up = resize(seg_up, out_hw, method="bilinear", align_corners=True)

        # EDSR chain: /4 decoder output -> x(scale_factor * 4) via 2x deconvs
        chans = [64, 64, 32, 16] if self.scale_factor == 4 else [64, 32, 16]
        sr_up = sr
        from .blocks import qdeconv

        for i, ch in enumerate(chans):
            # torch ConvTranspose2d(2, stride=2, padding=0) => lax pad k-1-p=1
            sr_up = qdeconv(ch, 2, stride=2, padding=0, dtype=self.dtype,
                            name=f"up_sr_{i}", train=train)(sr_up)
            sr_up = _EDSRConv(ch, dtype=self.dtype, name=f"up_edsr_{i}")(sr_up, train)
        sr_up = qconv(3, 1, dtype=self.dtype, name="up_conv_last", train=train)(sr_up)

        fea_seg = qconv(3, 1, dtype=self.dtype, name="pointwise_conv",
                        train=train)(seg_up)
        fea_seg = nn.relu(_bn(train, self.dtype, "pointwise_bn")(fea_seg))
        return seg_up, sr_up, fea_seg, sr_up
