"""Space-to-depth lowering of the big strided (de)convolutions.

The back-projection stages' k=8 stride=4 convs/deconvs (dbpn.py:17-28,
kbpn.py:23-26) are the FLOP-dominant ops of CSBSR.  On TPU the standard
lowering is to fold the stride into the channel dimension:

  conv k8 s4 p2   ==  space-to-depth(4) -> 2x2 VALID conv over 16C channels
  deconv k8 s4 p2 ==  2x2 VALID conv producing s^2 phase outputs
                      -> per-phase shifted gather -> depth-to-space

Both are exact algebraic rearrangements of the same multiply-adds (weights
are regrouped, not altered), so checkpoints stay layout-compatible: these
functions take the ordinary flax kernels ((k,k,I,O) for conv, (k,k,O,I) for
transpose_kernel deconv).

Generalised to any kernel k divisible by stride s.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["s2d_conv", "s2d_deconv", "can_s2d_conv", "can_s2d_deconv"]


def can_s2d_conv(kernel_size: int, stride: int, padding: int) -> bool:
    return stride > 1 and kernel_size % stride == 0


def can_s2d_deconv(kernel_size: int, stride: int, padding: int) -> bool:
    # exactness of the phase interleave needs out = s*H, i.e. k - s - 2p == 0
    # (true for every CSBSR deconv geometry: (6,2,2), (8,4,2), (12,8,2),
    # (4,2,1), (2,2,0))
    return (
        stride > 1
        and kernel_size % stride == 0
        and kernel_size - stride - 2 * padding == 0
    )


def s2d_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: int) -> jnp.ndarray:
    """Strided conv via space-to-depth.

    x: (B, H, W, C); w: (k, k, C, O) flax layout; torch Conv2d(k, s, p)
    semantics. Requires (H + 2p) % s == 0 (true for the CSBSR geometries).
    """
    k = w.shape[0]
    s = stride
    t = k // s  # taps per phase
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    assert hp % s == 0 and wp % s == 0, (hp, wp, s)
    # space-to-depth: (B, hp/s, s, wp/s, s, C) -> (B, hp/s, wp/s, s*s*C)
    xs = xp.reshape(b, hp // s, s, wp // s, s, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // s, wp // s, s * s * c)
    # regroup weights: W[s*a+dy, s*b+dx, c, o] -> W2[a, b, (dy,dx,c), o]
    w2 = w.reshape(t, s, t, s, c, -1)  # (a, dy, b, dx, c, o)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(t, t, s * s * c, -1)
    return jax.lax.conv_general_dilated(
        xs, w2, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_deconv(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: int) -> jnp.ndarray:
    """Transposed conv via phase decomposition + depth-to-space.

    x: (B, H, W, C); w: (k, k, O, I) (flax transpose_kernel layout = torch
    (I, O, k, k) transposed); torch ConvTranspose2d(k, s, p) semantics:
    out = (H-1)*s + k - 2p.

    Derivation: out[sY+dy] = sum_t x[Y + q(dy) - t] * W[i0(dy) + s*t] with
    i0 = (dy+p) % s, q = (dy+p) // s, t in [0, k/s).  All phases share one
    (k/s x k/s) VALID conv over x padded by (k/s - 1); phase (dy,dx) reads
    that conv's output at offset (q(dy), q(dx)).
    """
    k = w.shape[0]
    s = stride
    t = k // s
    b, h, wd, c_in = x.shape
    o = w.shape[2]
    # flip+swap: deconv with transpose_kernel computes correlation of the
    # zero-stuffed input with the kernel flipped in space and (O,I) swapped.
    # Phase kernels: K[dy,dx][a,b,c,o] = W[i0y + s*a, i0x + s*b, o, c]
    xp = jnp.pad(x, ((0, 0), (t - 1, t - 1), (t - 1, t - 1), (0, 0)))

    # build the merged kernel for all s*s phases:
    # out_conv[..., z, y, (phase,o)] = sum_{a,b,c} xp[z+a, y+b, c] * K[phase][a,b,c,o]
    phase_kernels = []
    for dy in range(s):
        i0y = (dy + padding) % s
        for dx in range(s):
            i0x = (dx + padding) % s
            # taps ordered so larger i (smaller input index) matches larger a:
            # input idx = Y + q - t' ; with conv over xp (offset a = t-1-t'),
            # kernel tap a corresponds to t' = t-1-a, i = i0 + s*(t-1-a)
            wk = w[i0y + s * (t - 1 - jnp.arange(t))][:, i0x + s * (t - 1 - jnp.arange(t))]
            # wk: (t, t, O, I) -> (t, t, I, O)
            phase_kernels.append(jnp.transpose(wk, (0, 1, 3, 2)))
    wcat = jnp.concatenate(phase_kernels, axis=-1)  # (t, t, I, s*s*O)
    conv_out = jax.lax.conv_general_dilated(
        xp, wcat, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, h + t - 1, w + t - 1, s*s*O)
    hc, wc = conv_out.shape[1], conv_out.shape[2]

    # gather per-phase shifted slices and interleave (depth-to-space with
    # phase-dependent offsets)
    out_h = (h - 1) * s + k - 2 * padding
    out_w = (wd - 1) * s + k - 2 * padding
    rows = []
    idx = 0
    phases = []
    for dy in range(s):
        qy = (dy + padding) // s
        for dx in range(s):
            qx = (dx + padding) // s
            ph = jax.lax.dynamic_slice(
                conv_out,
                (0, qy, qx, idx * o),
                (b, h, wd, o),
            )
            phases.append(ph)
            idx += 1
    # phases[dy*s+dx][Y,X] = out[sY+dy, sX+dx]
    stacked = jnp.stack(phases, axis=3)  # (B, H, W, s*s, O)
    stacked = stacked.reshape(b, h, wd, s, s, o)
    out = stacked.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * s, wd * s, o)
    # crop to the torch output size: out spans sY+dy for Y in [0,H), minus the
    # regions the stride/padding geometry excludes
    # full interleave covers y in [0, s*H); torch output y' = y - (p - ...)?
    # With the phase formula out[sY+dy] indexed from Y=0, valid torch outputs
    # are exactly the first out_h rows when p < s (q in {0,..}); general p<s
    # keeps alignment at 0.
    return out[:, :out_h, :out_w, :]
