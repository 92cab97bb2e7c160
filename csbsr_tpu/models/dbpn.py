"""DBPN - Deep Back-Projection Networks (dense variants).

TPU-native rebuild of `/root/reference/model/modeling/dbpn.py` (Net_2/4/6/
7/8/10): feat0 3x3 conv(feat_ch) -> feat1 1x1 conv(base_ch) -> alternating
Up/Down back-projection blocks with dense 1x1 stage merges -> output conv
over the concat of all Up outputs.

Per-scale (kernel, stride, padding): x2 (6,2,2), x4 (8,4,2), x8 (12,8,2)
(`dbpn.py:17-28`).  Stage count T: Net_T has T up-projections; dense concat
grows the channel count by base_ch per stage.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvBlock, UpBlock, DownBlock, D_UpBlock, D_DownBlock

_CONV_SETTING = {2: (6, 2, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


class DBPN(nn.Module):
    """Dense DBPN with `num_stages` up-projections (Net_<num_stages>).

    Matches dbpn.py Net_2 (:12), Net_4 (:67), Net_6 (:138), Net_7 (:313),
    Net_8 (:405), Net_10 (:506): feat_ch=256, base_ch=64 for every variant.
    """

    scale_factor: int = 4
    num_channels: int = 3
    num_stages: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = _CONV_SETTING[self.scale_factor]
        # Every Net_T shares base_filter=64, feat=256 defaults
        # (`dbpn.py:13,68,139,...` — Net_2 included; caught by the
        # reference-oracle test, which failed on a 128/32 special case).
        feat_ch = 256
        base_ch = 64

        conv = lambda f, ks, st, pd, name: ConvBlock(
            f, ks, st, pd, use_bias=True, activation="prelu", norm=None,
            prelu_init=0.25, dtype=self.dtype, name=name,
        )

        x = conv(feat_ch, 3, 1, 1, "feat0")(x, train)
        x = conv(base_ch, 1, 1, 0, "feat1")(x, train)

        # Net_4 wiring (dbpn.py:110-135): plain up1/down1/up2, then dense
        # D_Down(t-1)/D_Up(t-1) pairs with growing concats.
        h1 = UpBlock(base_ch, k, s, p, dtype=self.dtype, name="up1")(x, train)
        if self.num_stages == 1:
            concat_h = h1
        else:
            l1 = DownBlock(base_ch, k, s, p, dtype=self.dtype, name="down1")(h1, train)
            h2 = UpBlock(base_ch, k, s, p, dtype=self.dtype, name="up2")(l1, train)
            concat_h = jnp.concatenate([h2, h1], axis=-1)
            concat_l = l1
            for t in range(3, self.num_stages + 1):
                l = D_DownBlock(base_ch, k, s, p, t - 1, dtype=self.dtype, name=f"down{t-1}")(concat_h, train)
                concat_l = jnp.concatenate([l, concat_l], axis=-1)
                h = D_UpBlock(base_ch, k, s, p, t - 1, dtype=self.dtype, name=f"up{t}")(concat_l, train)
                concat_h = jnp.concatenate([h, concat_h], axis=-1)

        out = ConvBlock(
            self.num_channels, 3, 1, 1, use_bias=True, activation=None,
            norm=None, dtype=self.dtype, name="output_conv",
        )(concat_h, train)
        return out
