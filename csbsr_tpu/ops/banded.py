"""Exact convolution on banded (piecewise-constant) maps.

The reference broadcasts per-sample kernel vectors to full spatial maps and
runs 3x3 convs over them (`kbpn.py:565-567` fe_kernel on a 224^2 map of 441
constant channels - ~176 GFLOP/image/stage of redundant work; similarly the
SFT condition channels, `kbpn.py:511-518`).  A zero-padded conv of a
spatially constant map is itself *banded*: value[y, x] = V[r(y), c(x)] where
r/c select from {first w rows, middle, last w rows}.  Convolving a banded map
keeps it banded with width w+1, so the entire constant-input conv chain runs
on a (2w+3)^2 representative tile - exact to the float op, thousands of
times cheaper.

A banded map of width w is stored as vals: (B, 2w+1, 2w+1, C):
rows 0..w-1 = first rows, row w = middle, rows w+1..2w = last rows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["banded_from_vector", "banded_conv3x3", "banded_conv1x1", "materialize"]


def banded_from_vector(vec: jnp.ndarray) -> jnp.ndarray:
    """(B, C) constant map -> banded width 0: vals (B, 1, 1, C)."""
    return vec[:, None, None, :]


def _rep_tile(vals: jnp.ndarray) -> jnp.ndarray:
    """Banded width-w vals -> representative (2w+3)^2 tile (middle row/col
    tripled so a 3x3 conv sees correct neighbourhoods everywhere)."""
    b, s, _, c = vals.shape
    w = (s - 1) // 2
    mid_r = vals[:, w : w + 1]
    rows = jnp.concatenate([vals[:, :w], mid_r, mid_r, mid_r, vals[:, w + 1 :]], axis=1)
    mid_c = rows[:, :, w : w + 1]
    tile = jnp.concatenate([rows[:, :, :w], mid_c, mid_c, mid_c, rows[:, :, w + 1 :]], axis=2)
    return tile  # (B, 2w+3, 2w+3, C)


def banded_conv3x3(vals: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """3x3 zero-padded conv of a banded map; returns banded width w+1.

    kernel: (3, 3, C_in, C_out) flax layout. Valid while the true image is
    at least (2(w+1)+1) pixels per side (always true here: H,W >= 56, w <= 3).
    """
    tile = _rep_tile(vals)
    out = jax.lax.conv_general_dilated(
        tile, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out  # (B, 2w+3, 2w+3, C_out) = banded width w+1


def banded_conv1x1(vals: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """1x1 conv keeps the band width."""
    out = jnp.einsum("bijc,co->bijo", vals, kernel[0, 0])
    if bias is not None:
        out = out + bias
    return out


def materialize(vals: jnp.ndarray, h: int, w_out: int) -> jnp.ndarray:
    """Banded (B, 2w+1, 2w+1, C) -> full (B, H, W, C)."""
    b, s, _, c = vals.shape
    w = (s - 1) // 2
    if w == 0:
        return jnp.broadcast_to(vals, (b, h, w_out, c))
    mid_r = jnp.broadcast_to(vals[:, w : w + 1], (b, h - 2 * w, s, c))
    rows = jnp.concatenate([vals[:, :w], mid_r, vals[:, w + 1 :]], axis=1)
    mid_c = jnp.broadcast_to(rows[:, :, w : w + 1], (b, h, w_out - 2 * w, c))
    return jnp.concatenate([rows[:, :, :w], mid_c, rows[:, :, w + 1 :]], axis=2)
