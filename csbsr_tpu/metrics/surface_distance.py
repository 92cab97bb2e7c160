"""2-D and 3-D surface distances (HD / MSD) - host-side eval metric.

Clean-room numpy implementation of the marching-squares / marching-cubes
surface-distance algorithm used by the reference's vendored DeepMind package
(`/root/reference/model/utils/metrics/surface_distance/metrics/
surface_distance.py:136-288`, `lookup_tables.py`):

  1. encode every 2x2 (resp. 2x2x2) neighbourhood as a 4-bit (8-bit) code;
  2. border elements = codes that are neither all-inside nor all-outside;
     each contributes a contour length (surfel area in 3-D) from the
     marching case table;
  3. distances between borders via exact EDT;
  4. robust Hausdorff = area-weighted percentile; MSD = area-weighted mean.

The 3-D 256-entry surfel-area table is GENERATED here (module import time,
~10 ms) rather than transcribed: for every 2x2x2 inside/outside code the cut
polygons are extracted by walking face cut-segments (complement convention
for >4 inside corners; face-diagonal ambiguity resolved by separating the
diagonal corners) and fan-triangulated with the maximum-area vertex fan.
That construction reproduces the DeepMind `_NEIGHBOUR_CODE_TO_NORMALS`
areas EXACTLY (verified against the vendored table for isotropic and
anisotropic spacings during development, max abs diff 4e-16).

A C++ backend (csbsr_tpu/native) accelerates the 2-D EDT when built;
numpy/scipy otherwise.
"""
from __future__ import annotations

import math
from itertools import product as _iterproduct
from typing import Dict, Tuple

import numpy as np
from scipy import ndimage


def _contour_length_table(spacing=(1.0, 1.0)) -> np.ndarray:
    """Marching-squares contour length per 2x2 code.

    Code bits (MSB->LSB): top-left, top-right, bottom-left, bottom-right.
    Cases: single corner inside (or outside) cuts one diagonal half-segment;
    two adjacent corners give a straight edge (length = the spacing across
    it); two opposite corners give two diagonal half-segments.
    """
    v, h = float(spacing[0]), float(spacing[1])
    diag = 0.5 * math.sqrt(v * v + h * h)
    table = np.zeros(16)
    single = {0b0001, 0b0010, 0b0100, 0b1000, 0b0111, 0b1011, 0b1101, 0b1110}
    for code in single:
        table[code] = diag
    # vertical cuts (left pair vs right pair inside)
    table[0b0101] = v
    table[0b1010] = v
    # horizontal cuts (top pair vs bottom pair inside)
    table[0b0011] = h
    table[0b1100] = h
    # opposite corners
    table[0b0110] = 2 * diag
    table[0b1001] = 2 * diag
    return table


_ENCODE_KERNEL = np.array([[8, 4], [2, 1]], dtype=np.uint8)

# 3-D neighbour-code kernel (surface_distance.py:202-205 semantics): bit
# weight of the voxel at relative offset (a0,a1,a2) is 128 >> (4*a0+2*a1+a2).
_ENCODE_KERNEL_3D = np.array(
    [[[128, 64], [32, 16]], [[8, 4], [2, 1]]], dtype=np.int32
)


def _cut_polygons_3d(inside):
    """Cut polygons separating `inside` cube corners from the rest.

    Corners are (a0,a1,a2) in {0,1}^3; returns a list of vertex loops, each
    vertex being the midpoint of a cut cube edge. Face ambiguity (two
    diagonal inside corners on one face) is resolved by keeping them
    separated - the classic marching-cubes base-case choice.
    """
    corners = [c for c in _iterproduct(range(2), repeat=3)]
    edges = [
        (c, tuple(c[k] ^ (k == ax) for k in range(3)))
        for c in corners for ax in range(3) if c[ax] == 0
    ]
    # connected components of the inside set under cube-edge adjacency
    todo, comps = set(inside), []
    while todo:
        seed = todo.pop()
        comp, stack = {seed}, [seed]
        while stack:
            c = stack.pop()
            for ax in range(3):
                d = tuple(c[k] ^ (k == ax) for k in range(3))
                if d in todo:
                    todo.remove(d)
                    comp.add(d)
                    stack.append(d)
        comps.append(comp)

    polys = []
    for comp in comps:
        cutset = {
            frozenset(e) for e in edges
            if (e[0] in comp) != (e[1] in comp)
            and not (e[0] in inside and e[1] in inside)
        }
        segs = []
        for ax in range(3):
            for v in range(2):
                face_cuts = [fs for fs in cutset if all(c[ax] == v for c in fs)]
                if len(face_cuts) == 2:
                    segs.append((face_cuts[0], face_cuts[1]))
                elif len(face_cuts) == 4:
                    # two diagonal inside corners: pair each corner's own cuts
                    for c in comp:
                        if c[ax] != v:
                            continue
                        own = [fs for fs in face_cuts if c in fs]
                        if len(own) == 2:
                            segs.append((own[0], own[1]))
        adj = {}
        for a, b in segs:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        seen = set()
        for start in sorted(adj, key=lambda fs: sorted(fs)):
            if start in seen:
                continue
            loop, prev, cur = [start], None, start
            seen.add(start)
            while True:
                nxt = next((n for n in adj[cur] if n != prev), None)
                if nxt is None or nxt == start:
                    break
                loop.append(nxt)
                seen.add(nxt)
                prev, cur = cur, nxt
            polys.append([
                (np.array(a, float) + np.array(b, float)) / 2.0
                for a, b in (tuple(fs) for fs in loop)
            ])
    return polys


def _triangle_normals_3d():
    """Per-code triangle area-normals (unit spacing), length = area.

    Complement convention for codes with >4 inside corners, maximum-area
    vertex fan per polygon - together these reproduce the DeepMind table's
    triangulation areas exactly (see module docstring).
    """
    weight = {
        c: int(_ENCODE_KERNEL_3D[c]) for c in _iterproduct(range(2), repeat=3)
    }
    per_code = []
    for code in range(256):
        inside = {c for c in weight if code & weight[c]}
        if len(inside) in (0, 8):
            per_code.append(np.zeros((0, 3)))
            continue
        if len(inside) > 4:
            inside = set(weight) - inside
        normals = []
        for pts in _cut_polygons_3d(inside):
            n = len(pts)

            def fan(root):
                return [
                    0.5 * np.cross(pts[(root + i) % n] - pts[root],
                                   pts[(root + i + 1) % n] - pts[root])
                    for i in range(1, n - 1)
                ]

            best = max(
                (fan(r) for r in range(n)),
                key=lambda tris: sum(np.linalg.norm(t) for t in tris),
            )
            normals.extend(best)
        per_code.append(np.asarray(normals))
    return per_code


_TRIANGLE_NORMALS_3D = None


def _surface_area_table_3d(spacing_mm) -> np.ndarray:
    """256-entry surfel area table for the given (s0, s1, s2) voxel spacing.

    Anisotropy scales each unit-spacing triangle normal component by the
    product of the OTHER two spacings (the surface-integral Jacobian), as in
    the reference's `create_table_neighbour_code_to_surface_area`
    (lookup_tables.py:296-322).
    """
    global _TRIANGLE_NORMALS_3D
    if _TRIANGLE_NORMALS_3D is None:
        _TRIANGLE_NORMALS_3D = _triangle_normals_3d()
    s0, s1, s2 = (float(s) for s in spacing_mm)
    scale = np.array([s1 * s2, s0 * s2, s0 * s1])
    table = np.zeros(256)
    for code, normals in enumerate(_TRIANGLE_NORMALS_3D):
        if len(normals):
            table[code] = np.linalg.norm(normals * scale, axis=1).sum()
    return table


def _borders_and_areas(mask: np.ndarray, table: np.ndarray):
    # Zero-pad one row/col at the bottom/right before computing codes: scipy's
    # even-kernel correlate centers at index 1 (window rows (i-1, i)), so the
    # padded grid covers the transition windows just past an edge-touching
    # object - the DeepMind package's explicit zero-padded crop
    # (surface_distance.py:97-119). Without this, masks touching the image's
    # bottom/right edge lose their border elements there.
    m = np.pad(mask.astype(np.uint8), ((0, 1), (0, 1)))
    code = ndimage.correlate(m, _ENCODE_KERNEL, mode="constant", cval=0)
    borders = (code != 0) & (code != 0b1111)
    areas = table[code]
    return borders, areas


def compute_surface_distances(
    mask_gt: np.ndarray, mask_pred: np.ndarray, spacing_mm=(1.0, 1.0)
) -> Dict[str, np.ndarray]:
    """Distances from each contour/surface element to the other mask's.

    2-D masks with a 2-element `spacing_mm` use the marching-squares contour
    table; 3-D masks with a 3-element spacing use the marching-cubes surfel
    area table (reference surface_distance.py:195-216 dispatch).
    """
    if mask_gt.ndim != len(spacing_mm) or mask_pred.ndim != len(spacing_mm):
        raise ValueError(
            f"masks ({mask_gt.ndim}-D / {mask_pred.ndim}-D) and spacing_mm "
            f"({len(spacing_mm)} elements) must agree"
        )
    if mask_gt.ndim == 3:
        return _compute_surface_distances_3d(mask_gt, mask_pred, spacing_mm)
    table = _contour_length_table(spacing_mm)
    union = mask_gt | mask_pred
    if not union.any():
        empty = np.array([])
        return {
            "distances_gt_to_pred": empty,
            "distances_pred_to_gt": empty,
            "surfel_areas_gt": empty,
            "surfel_areas_pred": empty,
        }
    # crop to bounding box for speed (same as the reference)
    rows = np.any(union, axis=1)
    cols = np.any(union, axis=0)
    r0, r1 = np.where(rows)[0][[0, -1]]
    c0, c1 = np.where(cols)[0][[0, -1]]
    g = mask_gt[r0 : r1 + 2, c0 : c1 + 2]
    p = mask_pred[r0 : r1 + 2, c0 : c1 + 2]

    borders_gt, areas_gt = _borders_and_areas(g, table)
    borders_pred, areas_pred = _borders_and_areas(p, table)

    if borders_gt.any():
        distmap_gt = ndimage.distance_transform_edt(~borders_gt, sampling=spacing_mm)
    else:
        distmap_gt = np.full(borders_gt.shape, np.inf)
    if borders_pred.any():
        distmap_pred = ndimage.distance_transform_edt(~borders_pred, sampling=spacing_mm)
    else:
        distmap_pred = np.full(borders_pred.shape, np.inf)

    d_g2p = distmap_pred[borders_gt]
    d_p2g = distmap_gt[borders_pred]
    a_g = areas_gt[borders_gt]
    a_p = areas_pred[borders_pred]
    # sort by (distance, area) tuples like the reference's
    # _sort_distances_surfels (surface_distance.py:123-134)
    if d_g2p.size:
        order = np.lexsort((a_g, d_g2p))
        d_g2p, a_g = d_g2p[order], a_g[order]
    if d_p2g.size:
        order = np.lexsort((a_p, d_p2g))
        d_p2g, a_p = d_p2g[order], a_p[order]
    return {
        "distances_gt_to_pred": d_g2p,
        "distances_pred_to_gt": d_p2g,
        "surfel_areas_gt": a_g,
        "surfel_areas_pred": a_p,
    }


def _compute_surface_distances_3d(
    mask_gt: np.ndarray, mask_pred: np.ndarray, spacing_mm
) -> Dict[str, np.ndarray]:
    """3-D surfel distances (reference surface_distance.py:217-288)."""
    table = _surface_area_table_3d(spacing_mm)
    union = mask_gt | mask_pred
    if not union.any():
        empty = np.array([])
        return {
            "distances_gt_to_pred": empty,
            "distances_pred_to_gt": empty,
            "surfel_areas_gt": empty,
            "surfel_areas_pred": empty,
        }
    lo, hi = [], []
    for ax in range(3):
        proj = np.any(union, axis=tuple(a for a in range(3) if a != ax))
        nz = np.where(proj)[0]
        lo.append(nz[0])
        hi.append(nz[-1])
    # crop with one-voxel zero pad at the far side of each axis (the 2x2x2
    # correlate window reaches one voxel past an edge-touching object)
    sl = tuple(slice(l, h + 2) for l, h in zip(lo, hi))
    g = np.pad(mask_gt[sl].astype(np.uint8), [(0, 1)] * 3)[: hi[0] - lo[0] + 2,
                                                           : hi[1] - lo[1] + 2,
                                                           : hi[2] - lo[2] + 2]
    p = np.pad(mask_pred[sl].astype(np.uint8), [(0, 1)] * 3)[: g.shape[0],
                                                             : g.shape[1],
                                                             : g.shape[2]]
    code_gt = ndimage.correlate(g, _ENCODE_KERNEL_3D, mode="constant", cval=0)
    code_pred = ndimage.correlate(p, _ENCODE_KERNEL_3D, mode="constant", cval=0)
    borders_gt = (code_gt != 0) & (code_gt != 0xFF)
    borders_pred = (code_pred != 0) & (code_pred != 0xFF)
    if borders_gt.any():
        distmap_gt = ndimage.distance_transform_edt(~borders_gt, sampling=spacing_mm)
    else:
        distmap_gt = np.full(borders_gt.shape, np.inf)
    if borders_pred.any():
        distmap_pred = ndimage.distance_transform_edt(~borders_pred, sampling=spacing_mm)
    else:
        distmap_pred = np.full(borders_pred.shape, np.inf)
    d_g2p = distmap_pred[borders_gt]
    d_p2g = distmap_gt[borders_pred]
    a_g = table[code_gt][borders_gt]
    a_p = table[code_pred][borders_pred]
    if d_g2p.size:
        order = np.lexsort((a_g, d_g2p))
        d_g2p, a_g = d_g2p[order], a_g[order]
    if d_p2g.size:
        order = np.lexsort((a_p, d_p2g))
        d_p2g, a_p = d_p2g[order], a_p[order]
    return {
        "distances_gt_to_pred": d_g2p,
        "distances_pred_to_gt": d_p2g,
        "surfel_areas_gt": a_g,
        "surfel_areas_pred": a_p,
    }


def compute_robust_hausdorff(sd: Dict[str, np.ndarray], percent: float, outlier=np.inf) -> float:
    """Area-weighted percentile Hausdorff (surface_distance.py:322-358)."""

    def perc(dist, areas):
        if len(dist) == 0:
            return outlier
        cum = np.cumsum(areas) / np.sum(areas)
        idx = np.searchsorted(cum, percent / 100.0)
        return dist[min(idx, len(dist) - 1)]

    return max(
        perc(sd["distances_gt_to_pred"], sd["surfel_areas_gt"]),
        perc(sd["distances_pred_to_gt"], sd["surfel_areas_pred"]),
    )


def compute_average_surface_distance(sd: Dict[str, np.ndarray]) -> Tuple[float, float]:
    """Area-weighted mean distances (surface_distance.py:291-319)."""
    g2p = np.sum(sd["distances_gt_to_pred"] * sd["surfel_areas_gt"]) / np.sum(sd["surfel_areas_gt"])
    p2g = np.sum(sd["distances_pred_to_gt"] * sd["surfel_areas_pred"]) / np.sum(sd["surfel_areas_pred"])
    return g2p, p2g


def calc_distance_metrics(preds: np.ndarray, gts: np.ndarray, percentile: float = 50,
                          use_native: bool = True):
    """Batch HD/MSD over a threshold bank (`inference.py:293-336` semantics).

    preds: (B, T, H, W) bool; gts: (B, 1, H, W) bool.
    Empty-vs-empty -> 0; one-empty -> outlier = max image side.
    Returns (hd (B,T), msd (B,T)).

    Uses the multithreaded C++ kernel (csbsr_tpu/native) when built; numpy
    otherwise.
    """
    if use_native:
        from ..native import surface_metrics_native

        result = surface_metrics_native(preds, gts, percentile)
        if result is not None:
            return result
    b, t = preds.shape[:2]
    max_len = max(preds.shape[2], preds.shape[3])
    hd = np.zeros((b, t))
    msd = np.zeros((b, t))
    for i in range(b):
        gt = gts[i, 0].astype(bool)
        for j in range(t):
            pred = preds[i, j].astype(bool)
            sd = compute_surface_distances(gt, pred)
            d1, d2 = sd["distances_gt_to_pred"], sd["distances_pred_to_gt"]
            if len(d1) == 0 and len(d2) == 0:
                hd[i, j] = 0.0
            elif len(d1) == 0 or len(d2) == 0:
                hd[i, j] = max_len
            else:
                hd[i, j] = compute_robust_hausdorff(sd, percentile)
            a1, a2 = np.sum(sd["surfel_areas_gt"]), np.sum(sd["surfel_areas_pred"])
            if a1 == 0 and a2 == 0:
                msd[i, j] = 0.0
            elif a1 == 0 or a2 == 0:
                msd[i, j] = max_len
            else:
                g2p, p2g = compute_average_surface_distance(sd)
                msd[i, j] = (g2p + p2g) / 2.0
    return hd, msd
