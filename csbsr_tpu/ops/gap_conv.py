"""Exact algebraic collapse of GlobalAveragePool(conv3x3(x)).

The IKC kernel refiner ends with a 3x3 SAME conv whose output is
immediately global-average-pooled (reference `kbpn.py` fe_cat2 -> GAP,
mirrored in models/kbpn.py:KernelPredictorLikeIKC).  Because both the conv
and the mean are linear, the composition is a function of nine
border-corrected partial sums of the input only:

    mean_hw(conv3x3(x, k))[b,o]
      = (1/HW) * sum_{i,j,c} k[i,j,c,o] * T[i,j,b,c]

where T[i,j] is the sum of x over the subrectangle that tap (i,j) actually
touches under zero padding: the full sum minus the excluded border row/col
(plus the doubly-excluded corner).  This replaces an O(HW*Cin*Cout*9) conv
producing a Cout-channel full-resolution map (441 channels at HR in KBPN)
with O(HW*Cin) reductions + a 9*Cin*Cout contraction - exact, not an
approximation.
"""
from __future__ import annotations

import jax.numpy as jnp


def gap_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """mean over (H, W) of a SAME zero-padded 3x3 convolution, computed
    without materialising the convolution output.

    Args:
      x: (B, H, W, C) input, H >= 2 and W >= 2.
      kernel: (3, 3, C, O) conv kernel (HWIO).

    Returns:
      (B, O) array equal to jnp.mean(conv3x3_same(x, kernel), axis=(1, 2)),
      accumulated in float32.
    """
    assert kernel.shape[:2] == (3, 3), kernel.shape
    b, h, w, c = x.shape
    assert h >= 2 and w >= 2, (h, w)
    # f32 accumulation for bf16/f32 inputs; f64 inputs (reference-oracle
    # parity runs) keep full precision
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    xf = x.astype(acc)

    full = jnp.sum(xf, axis=(1, 2))  # (B, C)
    row_first = jnp.sum(xf[:, 0], axis=1)
    row_last = jnp.sum(xf[:, -1], axis=1)
    col_first = jnp.sum(xf[:, :, 0], axis=1)
    col_last = jnp.sum(xf[:, :, -1], axis=1)
    c00 = xf[:, 0, 0]
    c0w = xf[:, 0, -1]
    ch0 = xf[:, -1, 0]
    chw = xf[:, -1, -1]

    zero = jnp.zeros_like(full)
    # tap index i (kernel row): 0 shifts up -> last input row never touched;
    # 2 shifts down -> first input row never touched.  Same for columns.
    a = [row_last, zero, row_first]
    bb = [col_last, zero, col_first]
    corner = {
        (0, 0): chw, (0, 2): ch0, (2, 0): c0w, (2, 2): c00,
    }
    taps = []
    for i in range(3):
        row = []
        for j in range(3):
            t = full - a[i] - bb[j] + corner.get((i, j), zero)
            row.append(t)
        taps.append(jnp.stack(row))
    t_all = jnp.stack(taps)  # (3, 3, B, C)

    out = jnp.einsum(
        "ijbc,ijco->bo", t_all, kernel.astype(acc),
        preferred_element_type=acc,
    )
    return out / jnp.asarray(h * w, acc)
