"""Pallas TPU kernel: blocked min-plus contraction for the exact EDT.

Computes d2[b, i, j] = min_k ( g2[b, i, k] + (j - k)^2 ) - the row pass of
the 2-pass exact Euclidean distance transform (ops/edt.py), which feeds the
BoundaryCombo loss every training step.  The XLA fallback materialises
(..., H, W, block) intermediates through lax.map; this kernel keeps one
(rows_block x W) tile of g2 in VMEM and sweeps k in lane-width chunks on the
VPU, writing (rows_block x j_block) output tiles.

Grid: (batch*H tiles, W tiles).  Requires W % 128 == 0 after padding (the
wrapper pads and crops).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # sublane tile
_JBLK = 128  # lane tile


def _minplus_kernel(g2_ref, out_ref):
    """g2_ref: (ROWS, W); out_ref: (ROWS, JBLK) for grid position (r, jb)."""
    jb = pl.program_id(1)
    w = g2_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _JBLK), 1).astype(jnp.float32)
    j = jb.astype(jnp.float32) * _JBLK + lane

    def body(kc, acc):
        k0 = kc * _JBLK
        g2 = g2_ref[:, pl.ds(k0, _JBLK)]  # (ROWS, JBLK_k)
        k = kc.astype(jnp.float32) * _JBLK + lane
        # cand[r, j] = min over this k-chunk of g2[r, k] + (j - k)^2
        # expand: (ROWS, K, 1) + (1, K, JBLK)
        sq = (j[:, None, :] - k[:, :, None]) ** 2  # (1, K, JBLK)
        cand = jnp.min(g2[:, :, None] + sq, axis=1)  # (ROWS, JBLK)
        return jnp.minimum(acc, cand)

    acc0 = jnp.full((_ROWS, _JBLK), 1e18, jnp.float32)
    nk = w // _JBLK
    out_ref[:, :] = jax.lax.fori_loop(0, nk, body, acc0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def minplus_rows_pallas(g: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """d2[..., i, j] = min_k g[..., i, k]^2 + (j-k)^2 via the Pallas kernel.

    g: (..., H, W) float32 (the column-pass distances). Returns d2 (not
    sqrt'ed), matching ops.edt._min_plus_rows semantics.
    """
    orig_shape = g.shape
    w = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    g2 = jnp.minimum(g.astype(jnp.float32) ** 2, 1e18).reshape(rows, w)

    pad_r = (-rows) % _ROWS
    pad_w = (-w) % _JBLK
    # pad k-range with +inf so padded columns never win the min
    g2p = jnp.pad(g2, ((0, pad_r), (0, pad_w)), constant_values=1e18)
    rp, wp = g2p.shape

    out = pl.pallas_call(
        _minplus_kernel,
        grid=(rp // _ROWS, wp // _JBLK),
        in_specs=[
            pl.BlockSpec((_ROWS, wp), lambda r, jb: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _JBLK), lambda r, jb: (r, jb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, wp), jnp.float32),
        interpret=interpret,
    )(g2p)
    return out[:rows, :w].reshape(orig_shape)
