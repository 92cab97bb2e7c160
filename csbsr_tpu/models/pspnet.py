"""PSPNet segmentation head with dilated ResNet-34 extractor.

TPU-native rebuild of `/root/reference/model/modeling/pspnet_pytorch/`
(pspnet.py:23-207, extractors.py:36-161): ResNet-34 with layers 3/4 dilated
(stride 1, dilation 2/4, /8 total downsampling), pyramid pooling (1,2,3,6),
three 2x bilinear-upsample conv stages, sigmoid main head + aux head from
layer3 features.  Also the BlurSkip variants (kernel-conditioned residual
ladder, pspnet.py:127-207).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize, adaptive_avg_pool
from .blocks import PReLU, SFTLikeBlock, SFTBlock, ConvBlock, qconv


class BasicBlock(nn.Module):
    """extractors.py:41-70 (note: first block of a dilated layer keeps
    dilation 1; only blocks 2..n dilate - extractors.py:143-146)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        d = self.dilation
        out = qconv(
            self.planes, 3, stride=self.stride, padding=d, dilation=d,
            use_bias=False, dtype=self.dtype, name="conv1", train=train,
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = qconv(
            self.planes, 3, padding=d, dilation=d,
            use_bias=False, dtype=self.dtype, name="conv2", train=train,
        )(out)
        out = bn("bn2")(out)
        if self.use_downsample:
            res = qconv(
                self.planes, 1, stride=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv", train=train,
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(res)
        else:
            res = x
        return nn.relu(out + res)


class BottleneckPSP(nn.Module):
    """extractors.py:73-110: 1x1 -> dilated 3x3 -> 1x1 (x4) bottleneck."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        d = self.dilation
        out = qconv(self.planes, 1, use_bias=False, dtype=self.dtype,
                    name="conv1", train=train)(x)
        out = nn.relu(bn("bn1")(out))
        out = qconv(self.planes, 3, stride=self.stride, padding=d, dilation=d,
                    use_bias=False, dtype=self.dtype, name="conv2", train=train)(out)
        out = nn.relu(bn("bn2")(out))
        out = qconv(self.planes * 4, 1, use_bias=False, dtype=self.dtype,
                    name="conv3", train=train)(out)
        out = bn("bn3")(out)
        if self.use_downsample:
            res = qconv(self.planes * 4, 1, stride=self.stride, use_bias=False,
                        dtype=self.dtype, name="downsample_conv", train=train)(x)
            res = bn("downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNetDilated(nn.Module):
    """extractors.py:112-161: dilated-/8 ResNet; strides (1,2,1,1),
    dilations (1,1,2,4) with the first block of each layer undilated.
    Returns (layer4, layer3)."""

    block: str = "basic"  # 'basic' (18/34) | 'bottleneck' (50/101/152)
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = qconv(64, 7, stride=2, padding=3, use_bias=False,
                  dtype=self.dtype, name="conv1", train=train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        cls = BasicBlock if self.block == "basic" else BottleneckPSP
        expansion = 1 if self.block == "basic" else 4

        def layer(x, planes, blocks, stride, dilation, name):
            # first block: given stride, dilation 1, downsample if needed
            in_ch = x.shape[-1]
            x = cls(
                planes, stride, 1,
                use_downsample=(stride != 1 or in_ch != planes * expansion),
                dtype=self.dtype, name=f"{name}_0",
            )(x, train)
            for i in range(1, blocks):
                x = cls(planes, 1, dilation, dtype=self.dtype, name=f"{name}_{i}")(x, train)
            return x

        l = self.layers
        x = layer(x, 64, l[0], 1, 1, "layer1")
        x = layer(x, 128, l[1], 2, 1, "layer2")
        x3 = layer(x, 256, l[2], 1, 2, "layer3")
        x4 = layer(x3, 512, l[3], 1, 4, "layer4")
        return x4, x3


class ResNet34Dilated(ResNetDilated):
    """The CSBSR default extractor (backend='resnet34')."""


_RESNET_CONFIGS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


class DenseNetExtractor(nn.Module):
    """extractors.py:168-270: DenseNet-121 shape with /8 downsampling (only
    transition1 pools); deep features tapped after transition3.
    Returns (1024ch /8, 512ch /8)."""

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        x = qconv(self.num_init_features, 7, stride=2, padding=3, use_bias=False,
                  dtype=self.dtype, name="conv0", train=train)(x)
        x = nn.relu(bn("norm0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        deep = None
        for bi, num_layers in enumerate(self.block_config):
            for li in range(num_layers):
                h = nn.relu(bn(f"db{bi+1}_l{li+1}_norm1")(x))
                h = qconv(self.bn_size * self.growth_rate, 1, use_bias=False,
                          dtype=self.dtype, name=f"db{bi+1}_l{li+1}_conv1",
                          train=train)(h)
                h = nn.relu(bn(f"db{bi+1}_l{li+1}_norm2")(h))
                h = qconv(self.growth_rate, 3, padding=1, use_bias=False,
                          dtype=self.dtype, name=f"db{bi+1}_l{li+1}_conv2",
                          train=train)(h)
                x = jnp.concatenate([x, h], axis=-1)
            if bi != len(self.block_config) - 1:
                x = nn.relu(bn(f"t{bi+1}_norm")(x))
                x = qconv(x.shape[-1] // 2, 1, use_bias=False, dtype=self.dtype,
                          name=f"t{bi+1}_conv", train=train)(x)
                if bi < 1:  # only transition1 downsamples (extractors.py:203-206)
                    x = nn.avg_pool(x, (2, 2), strides=(2, 2))
                if bi == 2:
                    deep = x  # blocks index 5 == transition3 (extractors.py:255-262)
        return x, deep


class FireModule(nn.Module):
    """extractors.py:266-287."""

    squeeze: int
    expand1x1: int
    expand3x3: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        s = nn.relu(qconv(self.squeeze, 1, dtype=self.dtype, name="squeeze",
                          train=train)(x))
        e1 = nn.relu(qconv(self.expand1x1, 1, dtype=self.dtype, name="expand1x1",
                           train=train)(s))
        e3 = nn.relu(qconv(self.expand3x3, 3, padding=d, dilation=d,
                           dtype=self.dtype, name="expand3x3", train=train)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetExtractor(nn.Module):
    """extractors.py:290-340 (SqueezeNet 1.1, /8 with dilated fire stages).
    Returns (512ch /8, 256ch /8)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1 = nn.relu(qconv(64, 3, stride=2, padding=1, dtype=self.dtype,
                           name="feat1_conv", train=train)(x))
        f2 = nn.max_pool(f1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        f2 = FireModule(16, 64, 64, dtype=self.dtype, name="fire1")(f2, train)
        f2 = FireModule(16, 64, 64, dtype=self.dtype, name="fire2")(f2, train)
        f3 = nn.max_pool(f2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        f3 = FireModule(32, 128, 128, 2, dtype=self.dtype, name="fire3")(f3, train)
        f3 = FireModule(32, 128, 128, 2, dtype=self.dtype, name="fire4")(f3, train)
        f4 = FireModule(48, 192, 192, 4, dtype=self.dtype, name="fire5")(f3, train)
        f4 = FireModule(48, 192, 192, 4, dtype=self.dtype, name="fire6")(f4, train)
        f4 = FireModule(64, 256, 256, 4, dtype=self.dtype, name="fire7")(f4, train)
        f4 = FireModule(64, 256, 256, 4, dtype=self.dtype, name="fire8")(f4, train)
        return f4, f3


def make_extractor(backend: str, dtype):
    """extractors.py factory functions (:343-370), name='feats'."""
    if backend in _RESNET_CONFIGS:
        block, layers = _RESNET_CONFIGS[backend]
        return ResNetDilated(block=block, layers=layers, dtype=dtype, name="feats")
    if backend == "densenet":
        return DenseNetExtractor(dtype=dtype, name="feats")
    if backend == "squeezenet":
        return SqueezeNetExtractor(dtype=dtype, name="feats")
    raise NotImplementedError(backend)


class PSPModule(nn.Module):
    """pspnet.py:23-41: pyramid pooling (1,2,3,6) + 1x1 bottleneck + ReLU."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        h, w = feats.shape[1:3]
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(feats, (size, size))
            p = qconv(feats.shape[-1], 1, use_bias=False, dtype=self.dtype,
                      name=f"stage{i}", train=train)(p)
            # reference upsamples with F.interpolate bilinear (align_corners=False)
            priors.append(resize(p, (h, w), method="bilinear"))
        priors.append(feats)
        bottle = qconv(self.out_features, 1, dtype=self.dtype, name="bottleneck",
                       train=train)(jnp.concatenate(priors, axis=-1))
        return nn.relu(bottle)


class PSPUpsample(nn.Module):
    """pspnet.py:44-57: 2x bilinear -> conv3x3 -> BN -> PReLU."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = 2 * x.shape[1], 2 * x.shape[2]
        p = resize(x, (h, w), method="bilinear")
        p = qconv(self.out_channels, 3, padding=1, dtype=self.dtype,
                  name="conv", train=train)(p)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(p)
        return PReLU(name="prelu")(p)


class _AuxHead(nn.Module):
    """pspnet.py:78-86."""

    n_classes: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = qconv(256, 3, padding=1, use_bias=False,
                  dtype=self.dtype, name="conv0", train=train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = qconv(self.n_classes, 1, dtype=self.dtype, name="conv1", train=train)(x)
        return nn.sigmoid(x)


class PSPNet(nn.Module):
    """pspnet.py:60-125. Returns (main_sigmoid, aux_sigmoid)."""

    n_classes: int = 1
    backend: str = "resnet34"  # extractors.py zoo: resnet18..152/densenet/squeezenet
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, w = x.shape[1:3]
        f, aux_f = make_extractor(self.backend, self.dtype)(x, train)
        p = PSPModule(1024, dtype=self.dtype, name="psp")(f, train)
        p = nn.Dropout(0.3, deterministic=not train)(p)
        p = PSPUpsample(256, dtype=self.dtype, name="up_1")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_2")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_3")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        main = nn.sigmoid(qconv(self.n_classes, 1, dtype=self.dtype,
                                name="final", train=train)(p))
        aux = _AuxHead(self.n_classes, dtype=self.dtype, name="aux")(aux_f, train)
        aux = resize(aux, (h, w), method="bilinear", align_corners=True)
        return main, aux


class PSPNetBlurSkip(nn.Module):
    """pspnet.py:127-207: PSPNet + kernel-conditioned residual skip ladder.

    modify_blur_skip=True -> SFTLikeBlock (concat) / False -> SFTBlock
    (condition-only, the '_origin' variant, build_model.py:221-224).
    """

    n_classes: int = 1
    n_layer_blurskip: int = 2
    modify_blur_skip: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, kernel_vec, train: bool = False):
        h, w = x.shape[1:3]
        f, aux_f = ResNet34Dilated(dtype=self.dtype, name="feats")(x, train)
        p = PSPModule(1024, dtype=self.dtype, name="psp")(f, train)
        p = nn.Dropout(0.3, deterministic=not train)(p)
        p = PSPUpsample(256, dtype=self.dtype, name="up_1")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_2")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_3")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)

        # GAP(kernel) expanded to H x W (pspnet.py:177-178); with vector
        # kernels the GAP is identity.
        cond = jnp.broadcast_to(
            kernel_vec[:, None, None, :], (p.shape[0], h, w, kernel_vec.shape[-1])
        ).astype(p.dtype)
        _p = p
        for i in range(self.n_layer_blurskip):
            if self.modify_blur_skip:
                _p = SFTLikeBlock(64, dtype=self.dtype, name=f"blur_skip_sft{i}")(_p, cond, train)
            else:
                _p = SFTBlock(64, dtype=self.dtype, name=f"blur_skip_sft{i}")(_p, cond, train)
            # blocks.py ConvBlock defaults: relu + BatchNorm, no bias
            _p = ConvBlock(64, 3, 1, 1, activation="relu", norm="batch",
                           dtype=self.dtype, name=f"blur_skip_conv{i}")(_p, train)
        p = p + _p

        main = nn.sigmoid(qconv(self.n_classes, 1, dtype=self.dtype,
                                name="final", train=train)(p))
        aux = _AuxHead(self.n_classes, dtype=self.dtype, name="aux")(aux_f, train)
        aux = resize(aux, (h, w), method="bilinear", align_corners=True)
        return main, aux
