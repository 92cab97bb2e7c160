"""UNet16 - VGG16-encoder U-Net segmentation head.

TPU-native rebuild of `/root/reference/model/modeling/unet.py:124-207`
(khanhha crack_segmentation variant): VGG16 conv blocks as encoder, decoder
via deconv / pixel_shuffle / bilinear-interpolate (cfg.MODEL.UP_SAMPLE_METHOD),
sigmoid single-class output.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize, pixel_shuffle
from .blocks import qconv, qdeconv


def _conv_relu(x, ch, dtype, name, train=False):
    x = qconv(ch, 3, padding=1, dtype=dtype, name=name, train=train)(x)
    return nn.relu(x)


class DecoderBlockV2(nn.Module):
    """unet.py:89-122."""

    middle_channels: int
    out_channels: int
    up_sampling_method: str = "deconv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.up_sampling_method == "deconv":
            x = _conv_relu(x, self.middle_channels, self.dtype, "conv", train)
            # torch ConvTranspose2d(4,2,1)
            x = qdeconv(self.out_channels, 4, stride=2, padding=1,
                        dtype=self.dtype, name="deconv", train=train)(x)
            return nn.relu(x)
        if self.up_sampling_method == "pixel_shuffle":
            x = _conv_relu(x, self.middle_channels, self.dtype, "conv", train)
            return nn.relu(pixel_shuffle(x, 2))
        # 'interpolate'
        h, w = x.shape[1] * 2, x.shape[2] * 2
        x = resize(x, (h, w), method="bilinear")
        x = _conv_relu(x, self.middle_channels, self.dtype, "conv1", train)
        return _conv_relu(x, self.out_channels, self.dtype, "conv2", train)


class UNet16(nn.Module):
    """unet.py:124-207. Returns sigmoid map (num_classes=1)."""

    num_classes: int = 1
    num_filters: int = 32
    up_sampling_method: str = "deconv"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.num_filters
        pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))

        def vgg_block(v, chans, idx0):
            for j, ch in enumerate(chans):
                v = _conv_relu(v, ch, self.dtype, f"enc{idx0 + j}", train)
            return v

        conv1 = vgg_block(x, [64, 64], 0)
        conv2 = vgg_block(pool(conv1), [128, 128], 2)
        conv3 = vgg_block(pool(conv2), [256, 256, 256], 4)
        conv4 = vgg_block(pool(conv3), [512, 512, 512], 7)
        conv5 = vgg_block(pool(conv4), [512, 512, 512], 10)

        dec = lambda mid, out, name: DecoderBlockV2(
            mid, out, self.up_sampling_method, dtype=self.dtype, name=name
        )
        # note: center takes conv5 directly (unet.py:195) - no extra pool
        center = dec(nf * 8 * 4, nf * 8, "center")(conv5, train)
        dec4 = dec(nf * 8 * 4, nf * 8, "dec4")(jnp.concatenate([center, conv4], -1), train)
        dec3 = dec(nf * 4 * 4, nf * 4, "dec3")(jnp.concatenate([dec4, conv3], -1), train)
        dec2 = dec(nf * 4 * 2, nf * 2, "dec2")(jnp.concatenate([dec3, conv2], -1), train)
        dec1 = _conv_relu(jnp.concatenate([dec2, conv1], -1), nf, self.dtype, "dec1", train)
        out = qconv(self.num_classes, 1, dtype=self.dtype, name="final", train=train)(dec1)
        if self.num_classes > 1:
            return nn.log_softmax(out, axis=-1)
        return nn.sigmoid(out)
