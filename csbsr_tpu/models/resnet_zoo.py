"""openseg ResNet-family backbone zoo - TPU-native rebuild.

Rebuild of `/root/reference/model/modeling/hrnet_ocr/backbones/resnet/
{resnet_backbone,resnet_models,resnext_models,resnest_models,
wide_resnet_models}.py` and `backbones/backbone_selector.py`: the full arch
namespace the reference's `ResNetBackbone.__call__` dispatches on
(resnet_backbone.py:131-288), minus two entries that are dead or
weights-only upstream:

- `dcn_resnet_models.py` is commented out in the reference selector
  (resnet_backbone.py:241-264, guarded by a torch-0.4 check) - dead code
  there, so intentionally not an arch here.  The deformable-conv ops
  themselves live in `extensions.py` (DeformConv/ModulatedDeformConv).
- `wsl_resnext_models.py` defines no new architecture - it is the stock
  torchvision ResNeXt-101 32x{8,16,32,48}d plus an Instagram-pretrained
  state-dict download (wsl_resnext_models.py:22-27); architecturally it is
  covered by the `resnext101_32x*d_dilated8` entries below.

One parametrized skeleton instead of four vendored files: every arch is a
(stem, block, layers, groups/width, radix/avd, dilation) tuple, so the whole
zoo is a table plus three block types.  All modules are NHWC Flax; dilated
archs replace layer3/4 strides with dilation following the torch
`_nostride_dilate` hook (resnet_backbone.py:76-90): the stride conv of the
first block gets dilation d//2, later blocks the full d.  Dormant in CSBSR
(only HRNet-W48 is configured), rebuilt for surface completeness.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, name=name)


def _conv(x, ch, k, stride, dilation, groups, name, dtype):
    p = (k // 2) * dilation
    return nn.Conv(ch, (k, k), strides=(stride, stride), padding=[(p, p)] * 2,
                   kernel_dilation=(dilation, dilation), feature_group_count=groups,
                   use_bias=False, dtype=dtype, name=name)(x)


class SplAtConv(nn.Module):
    """Split-attention conv (resnest_models.py:25-104 SplAtConv2d, radix>1).

    Grouped conv to channels*radix, per-radix global pooling, a two-layer
    bottleneck FC producing radix-softmax attention per cardinal group
    (rSoftMax, resnest_models.py:90-104), weighted sum of the radix splits.
    """

    channels: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1          # cardinality
    radix: int = 2
    reduction_factor: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        ch, r, g = self.channels, self.radix, self.groups
        out = _conv(x, ch * r, 3, self.stride, self.dilation, g * r, "conv", self.dtype)
        out = nn.relu(_bn(train, self.dtype, "bn0")(out))
        b = out.shape[0]
        # radix-major split (torch.split(x, ch, dim=1))
        splits = out.reshape(b, out.shape[1], out.shape[2], r, ch)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)  # (B,1,1,ch)
        inter = max(ch * r // self.reduction_factor, 32)
        a = nn.Conv(inter, (1, 1), feature_group_count=g, dtype=self.dtype, name="fc1")(gap)
        a = nn.relu(_bn(train, self.dtype, "bn1")(a))
        a = nn.Conv(ch * r, (1, 1), feature_group_count=g, dtype=self.dtype, name="fc2")(a)
        # rSoftMax: view(B, g, r, ch/g) -> softmax over radix -> radix-major flat
        a = a.reshape(b, 1, 1, g, r, ch // g)
        a = nn.softmax(a, axis=4)
        a = jnp.moveaxis(a, 4, 3).reshape(b, 1, 1, r, ch)
        return (splits * a).sum(axis=3)


class _BasicBlock(nn.Module):
    """resnet_models.py:40-76 BasicBlock (expansion 1)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dilation_first: int = 1  # stride-conv dilation under _nostride_dilate
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        out = _conv(x, self.planes, 3, self.stride, self.dilation_first, 1, "conv1", self.dtype)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        out = _conv(out, self.planes, 3, 1, self.dilation, 1, "conv2", self.dtype)
        out = _bn(train, self.dtype, "bn2")(out)
        if self.use_downsample:
            res = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, dtype=self.dtype, name="ds_conv")(x)
            res = _bn(train, self.dtype, "ds_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class _Bottleneck(nn.Module):
    """Unified bottleneck: resnet_models.py:79-117 (groups/base_width covers
    ResNeXt, resnext_models.py:79-117) and resnest_models.py:118-215
    (radix>1 -> SplAtConv conv2, avd avg-pool, avg_down downsample)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    dilation_first: int = 1
    groups: int = 1
    base_width: int = 64
    radix: int = 1
    avd: bool = False
    avg_down: bool = False
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        d1 = self.dilation_first
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(_bn(train, self.dtype, "bn1")(out))
        conv2_stride = self.stride
        if self.avd and self.stride >= 1:
            conv2_stride = 1
        if self.radix > 1:
            out = SplAtConv(width, conv2_stride, d1, self.groups, self.radix,
                            dtype=self.dtype, name="conv2")(out, train)
        else:
            out = _conv(out, width, 3, conv2_stride, d1, self.groups, "conv2", self.dtype)
            out = nn.relu(_bn(train, self.dtype, "bn2")(out))
        if self.avd:  # avd_first=False everywhere in the reference table
            out = nn.avg_pool(out, (3, 3), strides=(self.stride, self.stride),
                              padding=[(1, 1)] * 2)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _bn(train, self.dtype, "bn3")(out)
        if self.use_downsample:
            res = x
            if self.avg_down:
                if self.stride > 1:
                    # torch AvgPool2d(stride, stride, ceil_mode=True,
                    # count_include_pad=False) (resnest_models.py:307): pad
                    # bottom/right to a stride multiple, exclude the padding
                    s = self.stride
                    ph = (-res.shape[1]) % s
                    pw = (-res.shape[2]) % s
                    res = nn.avg_pool(res, (s, s), strides=(s, s),
                                      padding=[(0, ph), (0, pw)],
                                      count_include_pad=False)
                res = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                              dtype=self.dtype, name="ds_conv")(res)
            else:
                res = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                              use_bias=False, dtype=self.dtype, name="ds_conv")(res)
            res = _bn(train, self.dtype, "ds_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class _IdentityResidualBlock(nn.Module):
    """wide_resnet_models.py:24-105 pre-activation identity-mapping block
    (2-conv wide or 3-conv bottleneck depending on `channels`)."""

    channels: Tuple[int, ...]
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        ch = self.channels
        need_proj = self.stride != 1 or x.shape[-1] != ch[-1]
        bn1 = nn.relu(_bn(train, self.dtype, "bn1")(x))
        shortcut = x
        if need_proj:
            shortcut = nn.Conv(ch[-1], (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="proj_conv")(bn1)
        if len(ch) == 2:
            out = _conv(bn1, ch[0], 3, self.stride, self.dilation, 1, "conv1", self.dtype)
            out = nn.relu(_bn(train, self.dtype, "bn2")(out))
            out = _conv(out, ch[1], 3, 1, self.dilation, 1, "conv2", self.dtype)
        else:
            out = nn.Conv(ch[0], (1, 1), strides=(self.stride, self.stride),
                          use_bias=False, dtype=self.dtype, name="conv1")(bn1)
            out = nn.relu(_bn(train, self.dtype, "bn2")(out))
            out = _conv(out, ch[1], 3, 1, self.dilation, 1, "conv2", self.dtype)
            out = nn.relu(_bn(train, self.dtype, "bn3")(out))
            out = nn.Conv(ch[2], (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        return out + shortcut


class WiderResNetA2Backbone(nn.Module):
    """wide_resnet_models.py:107-198 WiderResNetA2 (dilation=True): max-pool
    downsampling into mod2/mod3, strided conv into mod4, mod5/6/7 dilated
    2/4/4, BNReLU tail.  Returns (mod4, mod5, mod6, bnrelu(mod7))."""

    structure: Tuple[int, ...]
    dtype: Any = jnp.float32

    _CHANNELS = ((128, 128), (256, 256), (512, 512), (512, 1024),
                 (512, 1024, 2048), (1024, 2048, 4096))

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="mod1_conv1")(x)
        feats = []
        for mod_id, num in enumerate(self.structure):
            if mod_id < 2:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
            dil = 2 if mod_id == 3 else (4 if mod_id > 3 else 1)
            for b in range(num):
                stride = 2 if b == 0 and mod_id == 2 else 1
                x = _IdentityResidualBlock(self._CHANNELS[mod_id], stride, dil,
                                           dtype=self.dtype,
                                           name=f"mod{mod_id + 2}_block{b + 1}")(x, train)
            if mod_id >= 2:
                feats.append(x)
        out = nn.relu(_bn(train, self.dtype, "bn_out")(feats.pop()))
        return feats[0], feats[1], feats[2], out


_LAYERS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
           101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}

# arch -> spec; exactly the names resnet_backbone.py:137-288 dispatches on
# (the live elif chain - note its asymmetries: resnet18 only ships deepbase,
# resnet34 only plain, resnet152 only deepbase+dilated)
_RESNET_NAMES = (
    [f"deepbase_resnet18{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"resnet34{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"resnet50{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"deepbase_resnet50{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"resnet101{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"deepbase_resnet101{d}" for d in ("", "_dilated8", "_dilated16")]
    + [f"deepbase_resnet152{d}" for d in ("_dilated8", "_dilated16")]
)
ARCH_SPECS = {}
for _name in _RESNET_NAMES:
    _deep = _name.startswith("deepbase_")
    _depth = int(_name.removeprefix("deepbase_").removeprefix("resnet").split("_")[0])
    _dil = 8 if _name.endswith("dilated8") else (16 if _name.endswith("dilated16") else 1)
    ARCH_SPECS[_name] = dict(block="basic" if _depth <= 34 else "bottleneck",
                             layers=_LAYERS[_depth], deep_stem=_deep,
                             stem_width=64, dilate=_dil)
for _w in (8, 16, 32, 48):
    ARCH_SPECS[f"resnext101_32x{_w}d_dilated8"] = dict(
        block="bottleneck", layers=_LAYERS[101], deep_stem=False, stem_width=64,
        dilate=8, groups=32, base_width=_w)
for _d, _layers, _sw in ((50, _LAYERS[50], 32), (101, _LAYERS[101], 64),
                         (200, (3, 24, 36, 3), 64), (269, (3, 30, 48, 8), 64)):
    ARCH_SPECS[f"deepbase_resnest{_d}_dilated8"] = dict(
        block="bottleneck", layers=_layers, deep_stem=True, stem_width=_sw,
        dilate=8, radix=2, avd=True, avg_down=True)
for _n, _structure in ((16, (1, 1, 1, 1, 1, 1)), (20, (1, 1, 1, 3, 1, 1)),
                       (38, (3, 3, 6, 3, 1, 1))):
    ARCH_SPECS[f"wide_resnet{_n}_dilated8"] = dict(wide_structure=_structure)


class ResNetZooBackbone(nn.Module):
    """Backbone by arch name (BackboneSelector.get_backbone +
    ResNetBackbone.__call__).  Returns the last four stage features
    (layer1..layer4) - what the openseg nets consume (`x[-4:]`).

    `multi_grid` mirrors the DilatedResnetBackbone option: per-block dilation
    multipliers for layer4 of dilated archs (resnet_backbone.py:55-74).
    """

    arch: str = "deepbase_resnet101_dilated8"
    multi_grid: Optional[Sequence[int]] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        if self.arch not in ARCH_SPECS:
            raise NotImplementedError(
                f"unknown backbone arch '{self.arch}'; known: {sorted(ARCH_SPECS)}")
        spec = ARCH_SPECS[self.arch]
        if "wide_structure" in spec:
            return WiderResNetA2Backbone(tuple(spec["wide_structure"]),
                                         dtype=self.dtype, name="wider")(x, train)

        sw = spec["stem_width"]
        if spec["deep_stem"]:
            for i, ch in enumerate((sw, sw, sw * 2)):
                x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                            name=f"stem{i + 1}_conv")(x)
                x = nn.relu(_bn(train, self.dtype, f"stem{i + 1}_bn")(x))
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                        use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            x = nn.relu(_bn(train, self.dtype, "stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        basic = spec["block"] == "basic"
        expansion = 1 if basic else 4
        groups = spec.get("groups", 1)
        base_width = spec.get("base_width", 64)
        radix = spec.get("radix", 1)
        avg_down = spec.get("avg_down", False)

        def layer(x, planes, blocks, stride, dilation, name, mg=None):
            for b in range(blocks):
                s = stride if b == 0 else 1
                d = dilation * (mg[b] if mg else 1)
                # torch _nostride_dilate: the stride conv of block 0 gets d//2
                d1 = max(d // 2, 1) if (b == 0 and dilation > 1) else d
                use_ds = b == 0 and (stride != 1 or x.shape[-1] != planes * expansion)
                if basic:
                    x = _BasicBlock(planes, s, d, d1, use_ds, dtype=self.dtype,
                                    name=f"{name}_{b}")(x, train)
                else:
                    # resnest avd avg-pool applies on the first block of the
                    # strided/dilated stages (is_first, resnest_models.py:134)
                    x = _Bottleneck(planes, s, d, d1, groups, base_width, radix,
                                    avd=spec.get("avd", False) and b == 0 and name != "layer1",
                                    avg_down=avg_down, use_downsample=use_ds,
                                    dtype=self.dtype, name=f"{name}_{b}")(x, train)
            return x

        dilate = spec["dilate"]
        s3, d3 = (2, 1) if dilate == 1 else ((2, 1) if dilate == 16 else (1, 2))
        s4, d4 = (2, 1) if dilate == 1 else ((1, 2) if dilate == 16 else (1, 4))
        mg = tuple(self.multi_grid) if self.multi_grid is not None else None
        x1 = layer(x, 64, spec["layers"][0], 1, 1, "layer1")
        x2 = layer(x1, 128, spec["layers"][1], 2, 1, "layer2")
        x3 = layer(x2, 256, spec["layers"][2], s3, d3, "layer3")
        x4 = layer(x3, 512, spec["layers"][3], s4, d4, "layer4",
                   mg=mg if d4 > 1 else None)
        return x1, x2, x3, x4
