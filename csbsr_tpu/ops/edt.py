"""Exact Euclidean distance transform on device.

The reference computes the boundary-loss SDF on CPU with scipy per batch
(`/root/reference/model/utils/boundary_loss.py:28,54-65`), a device->host
round-trip inside the hot training step.  Here the exact 2-D EDT runs on the
TPU:

  pass 1 (columns): 1-D distance to nearest True along H via a forward and a
          backward `lax.scan` (the classic two-sweep chamfer recurrence,
          exact in 1-D).
  pass 2 (rows):    d2[i,j] = min_k g[i,k]^2 + (j-k)^2, evaluated as a
          min-plus contraction in j-blocks so peak memory stays at
          O(numel * block) instead of O(numel * W).

Total cost ~H*W^2 VPU ops (about 11 M at 224^2), noise next to the model's
conv FLOPs, and no host round-trip.  Results match
`scipy.ndimage.distance_transform_edt` exactly (both are exact EDTs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["edt", "signed_distance_map", "sdf_normalized", "find_boundaries_inner"]

_BIG = 1e9
_BLOCK = 32


def _scan_1d_distance(mask: jnp.ndarray) -> jnp.ndarray:
    """Distance (in rows, axis -2) to nearest True. mask: (..., H, W) bool.

    Closed form instead of a sequential H-step scan:
      f_i = min_{k<=i} (g0_k + i - k) = i + cummin_{k<=i}(g0_k - k)
      b_i = min_{k>=i} (g0_k + k - i) = -i + revcummin_{k>=i}(g0_k + k)
    — two vectorised lax.cummin passes (log-depth on device) in place of
    2*H dependent loop iterations. Exact, same recurrence fixpoint.
    """
    g0 = jnp.where(mask, 0.0, _BIG)  # (..., H, W)
    h = g0.shape[-2]
    idx = jnp.arange(h, dtype=g0.dtype).reshape((h, 1))
    f = idx + jax.lax.cummin(g0 - idx, axis=g0.ndim - 2)
    b = -idx + jax.lax.cummin(g0 + idx, axis=g0.ndim - 2, reverse=True)
    return jnp.minimum(f, b)


def _min_plus_rows(g: jnp.ndarray) -> jnp.ndarray:
    """d2[..., i, j] = min_k g2[..., i, k] + (j-k)^2, blocked over j."""
    w = g.shape[-1]
    g2 = jnp.minimum(g * g, _BIG)
    k = jnp.arange(w, dtype=jnp.float32)
    pad = (-w) % _BLOCK
    n_blocks = (w + pad) // _BLOCK

    def one_block(jb):
        j = jb * _BLOCK + jnp.arange(_BLOCK, dtype=jnp.float32)  # (B,)
        sq = (j[None, :] - k[:, None]) ** 2  # (W, B)
        # out[..., i, b] = min_k g2[..., i, k] + sq[k, b]
        return jnp.min(g2[..., :, :, None] + sq, axis=-2)  # (..., H, B)

    blocks = jax.lax.map(one_block, jnp.arange(n_blocks))  # (nb, ..., H, B)
    out = jnp.moveaxis(blocks, 0, -2)  # (..., H, nb, B)
    out = out.reshape(*out.shape[:-2], n_blocks * _BLOCK)
    return out[..., :w]


_USE_PALLAS = None


def _pallas_available() -> bool:
    global _USE_PALLAS
    if _USE_PALLAS is None:
        import jax as _jax

        _USE_PALLAS = _jax.default_backend() not in ("cpu",)
    return _USE_PALLAS


def edt(mask: jnp.ndarray) -> jnp.ndarray:
    """Exact Euclidean distance to the nearest True pixel, per 2-D slice.

    mask: bool (..., H, W). Returns float32 distances; pixels inside the mask
    get 0. If a slice has no True pixel the distances are huge (caller gates
    on `mask.any()` like the reference does).

    Equivalent to `scipy.ndimage.distance_transform_edt(~mask)` - scipy's
    `distance_transform_edt(x)` is the distance to the nearest zero of x,
    i.e. `edt(x == 0)`.

    The row pass uses the Pallas kernel on accelerators
    (ops/pallas/minplus.py) and the blocked XLA form on CPU.
    """
    g = _scan_1d_distance(mask.astype(jnp.bool_))
    if _pallas_available():
        from .pallas.minplus import minplus_rows_pallas

        return jnp.sqrt(minplus_rows_pallas(g))
    return jnp.sqrt(_min_plus_rows(g))


def find_boundaries_inner(mask: jnp.ndarray) -> jnp.ndarray:
    """skimage `find_boundaries(mode='inner')` for 2-D bool masks (..., H, W).

    Inner boundary: True pixels with at least one False 4-neighbour
    (skimage default connectivity=1). Used by the reference at
    `boundary_loss.py:62`.
    """
    m = mask.astype(jnp.bool_)
    pad = lambda a: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)], constant_values=True
    )
    p = pad(m)
    up = p[..., :-2, 1:-1]
    down = p[..., 2:, 1:-1]
    left = p[..., 1:-1, :-2]
    right = p[..., 1:-1, 2:]
    has_false_neighbor = ~(up & down & left & right)
    return m & has_false_neighbor


def signed_distance_map(mask: jnp.ndarray) -> jnp.ndarray:
    """Unnormalised SDM: negdist - posdist (reference `compute_sdf`, boundary_loss.py:69-95)."""
    m = mask.astype(jnp.bool_)
    posdis = edt(m)  # distance to mask (0 inside)
    negdis = edt(~m)  # distance to background (0 outside)
    return jnp.where(jnp.any(m, axis=(-2, -1), keepdims=True), negdis - posdis, 0.0)


def sdf_normalized(mask: jnp.ndarray) -> jnp.ndarray:
    """Normalised SDF in [-1, 1], zero on the inner boundary and for empty masks.

    Port of `compute_sdf1_1` (`boundary_loss.py:40-67`):
      sdf = norm01(negdis) - norm01(posdis); sdf[inner boundary] = 0;
      slices with an empty mask stay all-zero.

    scipy's `distance(posmask)` is distance-to-nearest-background pixel
    measured at every pixel = our `edt(~mask)`; `distance(negmask)` = `edt(mask)`.
    """
    m = mask.astype(jnp.bool_)
    any_pos = jnp.any(m, axis=(-2, -1), keepdims=True)
    posdis = jnp.where(any_pos, edt(~m), 0.0)  # scipy: distance(posmask)
    negdis = jnp.where(any_pos, edt(m), 0.0)  # scipy: distance(negmask)

    def norm01(d):
        dmin = jnp.min(d, axis=(-2, -1), keepdims=True)
        dmax = jnp.max(d, axis=(-2, -1), keepdims=True)
        return (d - dmin) / jnp.where(dmax > dmin, dmax - dmin, 1.0)

    sdf = norm01(negdis) - norm01(posdis)
    sdf = jnp.where(find_boundaries_inner(m), 0.0, sdf)
    return jnp.where(any_pos, sdf, 0.0)
