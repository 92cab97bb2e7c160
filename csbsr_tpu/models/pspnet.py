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
from .blocks import PReLU, SFTLikeBlock, SFTBlock, ConvBlock


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
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=[(d, d)] * 2, kernel_dilation=(d, d), use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            self.planes, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, name="conv2",
        )(out)
        out = bn("bn2")(out)
        if self.use_downsample:
            res = nn.Conv(
                self.planes, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            res = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name="downsample_bn",
            )(res)
        else:
            res = x
        return nn.relu(out + res)


class ResNet34Dilated(nn.Module):
    """extractors.py:112-161 with layers (3,4,6,3); returns (layer4, layer3)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        def layer(x, planes, blocks, stride, dilation, name):
            # first block: given stride, dilation 1, downsample if needed
            in_ch = x.shape[-1]
            x = BasicBlock(
                planes, stride, 1, use_downsample=(stride != 1 or in_ch != planes),
                dtype=self.dtype, name=f"{name}_0",
            )(x, train)
            for i in range(1, blocks):
                x = BasicBlock(planes, 1, dilation, dtype=self.dtype, name=f"{name}_{i}")(x, train)
            return x

        x = layer(x, 64, 3, 1, 1, "layer1")
        x = layer(x, 128, 4, 2, 1, "layer2")
        x3 = layer(x, 256, 6, 1, 2, "layer3")
        x4 = layer(x3, 512, 3, 1, 4, "layer4")
        return x4, x3


class PSPModule(nn.Module):
    """pspnet.py:23-41: pyramid pooling (1,2,3,6) + 1x1 bottleneck + ReLU."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        h, w = feats.shape[1:3]
        priors = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(feats, (size, size))
            p = nn.Conv(feats.shape[-1], (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"stage{i}")(p)
            # reference upsamples with F.interpolate bilinear (align_corners=False)
            priors.append(resize(p, (h, w), method="bilinear"))
        priors.append(feats)
        bottle = nn.Conv(self.out_features, (1, 1), dtype=self.dtype, name="bottleneck")(
            jnp.concatenate(priors, axis=-1)
        )
        return nn.relu(bottle)


class PSPUpsample(nn.Module):
    """pspnet.py:44-57: 2x bilinear -> conv3x3 -> BN -> PReLU."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = 2 * x.shape[1], 2 * x.shape[2]
        p = resize(x, (h, w), method="bilinear")
        p = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name="conv")(p)
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
        x = nn.Conv(256, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="conv1")(x)
        return nn.sigmoid(x)


class PSPNet(nn.Module):
    """pspnet.py:60-125. Returns (main_sigmoid, aux_sigmoid)."""

    n_classes: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h, w = x.shape[1:3]
        f, aux_f = ResNet34Dilated(dtype=self.dtype, name="feats")(x, train)
        p = PSPModule(1024, dtype=self.dtype, name="psp")(f)
        p = nn.Dropout(0.3, deterministic=not train)(p)
        p = PSPUpsample(256, dtype=self.dtype, name="up_1")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_2")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, name="up_3")(p, train)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        main = nn.sigmoid(nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="final")(p))
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
        p = PSPModule(1024, dtype=self.dtype, name="psp")(f)
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
                _p = SFTLikeBlock(64, dtype=self.dtype, name=f"blur_skip_sft{i}")(_p, cond)
            else:
                _p = SFTBlock(64, dtype=self.dtype, name=f"blur_skip_sft{i}")(_p, cond)
            # blocks.py ConvBlock defaults: relu + BatchNorm, no bias
            _p = ConvBlock(64, 3, 1, 1, activation="relu", norm="batch",
                           dtype=self.dtype, name=f"blur_skip_conv{i}")(_p, train)
        p = p + _p

        main = nn.sigmoid(nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="final")(p))
        aux = _AuxHead(self.n_classes, dtype=self.dtype, name="aux")(aux_f, train)
        aux = resize(aux, (h, w), method="bilinear", align_corners=True)
        return main, aux
