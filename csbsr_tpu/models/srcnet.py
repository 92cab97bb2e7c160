"""SrcNetSR (RCAN-like SR) and SegNet.

Rebuild of `/root/reference/model/modeling/srcnet.py`:
  - SrcNetSR (`:26-45`): conv -> RIR (10 residual groups x 20 channel-
    attention residual blocks) -> deconv upscale -> conv.
  - SegNet (`:91-260`): VGG-shaped encoder with max-pool indices and
    MaxUnpool decoder; our unpool uses one-hot scatter-free placement
    (blocks.max_pool_with_indices / max_unpool).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .blocks import max_pool_with_indices, max_unpool, qconv, qdeconv

_DECONV_SETTING = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class _CAResBlock(nn.Module):
    """srcnet.py:67-86 (channel-attention residual; note the reference
    returns s*m without the skip - we mirror that)."""

    base_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        m = qconv(self.base_ch, 3, padding=1, dtype=self.dtype, name="fe1_0", train=train)(x)
        m = nn.relu(m)
        m = qconv(self.base_ch, 3, padding=1, dtype=self.dtype, name="fe1_1", train=train)(m)
        s = jnp.mean(m, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.base_ch // 2, (1, 1), dtype=self.dtype, name="att_0")(s)
        s = nn.sigmoid(s)
        s = nn.Conv(self.base_ch, (1, 1), dtype=self.dtype, name="att_1")(s)
        s = nn.relu(s)
        return s * m


class SrcNetSR(nn.Module):
    """srcnet.py:26-45."""

    scale_factor: int = 4
    base_ch: int = 64
    n_groups: int = 10
    n_blocks: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = _DECONV_SETTING[self.scale_factor]
        f = qconv(self.base_ch, 3, padding=1, dtype=self.dtype, name="sconv1", train=train)(x)
        rir_in = f
        for g in range(self.n_groups):
            group_in = f
            for b in range(self.n_blocks):
                f = _CAResBlock(self.base_ch, dtype=self.dtype, name=f"rg{g}_rb{b}")(f, train)
            f = qconv(self.base_ch, 3, padding=1, dtype=self.dtype, name=f"rg{g}_conv", train=train)(f)
            f = group_in + f
        f = qconv(self.base_ch, 3, padding=1, dtype=self.dtype, name="rir_conv", train=train)(f)
        f = rir_in + f
        f = qdeconv(256, k, stride=s, padding=p, dtype=self.dtype,
                    name="upscaling", train=train)(f)
        return qconv(3, 3, padding=1, dtype=self.dtype, name="sconv2", train=train)(f)


class SegNet(nn.Module):
    """srcnet.py:91-260: SegNet with pooling-index unpooling, sigmoid out."""

    out_ch: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(v, ch, name):
            v = qconv(ch, 3, padding=1, dtype=self.dtype, name=f"conv{name}", train=train)(v)
            v = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=self.dtype, name=f"bn{name}")(v)
            return nn.relu(v)

        enc_cfg = [
            ([64, 64], "En1"),
            ([128, 128], "En2"),
            ([256, 256, 256], "En3"),
            ([512, 512, 512], "En4"),
            ([512, 512, 512], "En5"),
        ]
        indices = []
        for chans, tag in enc_cfg:
            for j, ch in enumerate(chans):
                x = cbr(x, ch, f"{tag}{j+1}")
            x, idx = max_pool_with_indices(x, 2, 2)
            indices.append(idx)

        dec_cfg = [
            ([512, 512, 512], "De5"),
            ([512, 512, 256], "De4"),
            ([256, 256, 128], "De3"),
            ([128, 64], "De2"),
            ([64], "De1"),
        ]
        for (chans, tag), idx in zip(dec_cfg, reversed(indices)):
            x = max_unpool(x, idx, 2)
            for j, ch in enumerate(chans):
                x = cbr(x, ch, f"{tag}{j+1}")
        x = qconv(self.out_ch, 3, padding=1, dtype=self.dtype, name="convDe1f", train=train)(x)
        return nn.sigmoid(x)
