"""3-D surface-distance parity tests (standalone - no reference package).

The generator in csbsr_tpu/metrics/surface_distance.py reproduces the
DeepMind package's marching-cubes surfel-area table exactly (verified
against the vendored `_NEIGHBOUR_CODE_TO_NORMALS` during development and by
`tools/check_surface_table_parity.py` when /root/reference is present).
These tests pin the analytically-known values and behaviors so the suite
stays self-contained.
"""
import math

import numpy as np
import pytest

from csbsr_tpu.metrics.surface_distance import (
    _ENCODE_KERNEL_3D,
    _surface_area_table_3d,
    compute_average_surface_distance,
    compute_robust_hausdorff,
    compute_surface_distances,
)


@pytest.mark.quick
def test_table_analytic_values():
    t = _surface_area_table_3d((1.0, 1.0, 1.0))
    assert t[0] == 0.0 and t[255] == 0.0
    # single corner inside -> corner-cut triangle, area sqrt(3)/8
    for code in (1, 2, 4, 8, 16, 32, 64, 128):
        assert t[code] == pytest.approx(math.sqrt(3) / 8)
    # adjacent pair -> planar quad of area sqrt(2)/2; code 3 = corners
    # (1,1,0)+(1,1,1) (kernel weights 2|1), adjacent along axis 2
    assert t[3] == pytest.approx(math.sqrt(2) / 2)
    # half-cube (one face's corners inside): unit flat cut. code 15 =
    # weights 8|4|2|1 = the a0=1 face
    assert t[15] == pytest.approx(1.0)
    # complement symmetry: flipping inside/outside leaves the cut unchanged
    np.testing.assert_allclose(t, t[::-1], atol=1e-12)


def test_table_anisotropic_scaling():
    # flat cut perpendicular to axis 0 scales with s1*s2 only
    t = _surface_area_table_3d((3.0, 2.0, 5.0))
    assert t[15] == pytest.approx(2.0 * 5.0)
    # corner triangle scales as norm of (s1*s2, s0*s2, s0*s1)/8
    expect = np.linalg.norm(np.array([10.0, 15.0, 6.0])) / 8.0
    assert t[1] == pytest.approx(expect)


@pytest.mark.quick
def test_kernel_layout():
    # bit weight of offset (a0,a1,a2) is 128 >> (4*a0 + 2*a1 + a2) - the
    # reference's ENCODE_NEIGHBOURHOOD_3D_KERNEL (lookup_tables.py:23)
    for a0 in range(2):
        for a1 in range(2):
            for a2 in range(2):
                assert _ENCODE_KERNEL_3D[a0, a1, a2] == 128 >> (4 * a0 + 2 * a1 + a2)


def test_sphere_area_bounds():
    # total surfel area of a rasterized sphere: marching cubes on binary
    # voxels over-estimates a smooth sphere's area by a bounded staircase
    # factor (measured 1.085 at r=24; the DeepMind table shares the bias)
    n, r = 64, 24.0
    ax = np.arange(n) - (n - 1) / 2.0
    z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
    ball = (z * z + y * y + x * x) <= r * r
    sd = compute_surface_distances(ball, ball, (1.0, 1.0, 1.0))
    area = float(np.sum(sd["surfel_areas_gt"]))
    smooth = 4 * math.pi * r * r
    assert 1.0 < area / smooth < 1.15


def test_identical_masks_zero_distance():
    rng = np.random.RandomState(3)
    m = rng.rand(12, 13, 14) > 0.7
    sd = compute_surface_distances(m, m, (1.0, 1.0, 1.0))
    assert compute_robust_hausdorff(sd, 95) == 0.0
    g2p, p2g = compute_average_surface_distance(sd)
    assert g2p == 0.0 and p2g == 0.0


def test_shifted_box_distances():
    g = np.zeros((20, 20, 20), bool)
    p = np.zeros((20, 20, 20), bool)
    g[4:10, 4:16, 4:16] = True
    p[9:15, 4:16, 4:16] = True  # shifted 5 voxels along axis 0
    sd = compute_surface_distances(g, p, (2.0, 1.0, 1.0))
    # farthest surfels of gt sit 5 voxels (=10 mm at s0=2) from pred
    assert compute_robust_hausdorff(sd, 100) == pytest.approx(10.0)
    # isotropic check too
    sd1 = compute_surface_distances(g, p, (1.0, 1.0, 1.0))
    assert compute_robust_hausdorff(sd1, 100) == pytest.approx(5.0)


def test_empty_mask_semantics():
    p = np.zeros((8, 8, 8), bool)
    p[2:5, 2:5, 2:5] = True
    sd = compute_surface_distances(np.zeros_like(p), p, (1.0, 1.0, 1.0))
    assert sd["distances_gt_to_pred"].size == 0
    assert np.isinf(sd["distances_pred_to_gt"]).all()
    sd = compute_surface_distances(np.zeros_like(p), np.zeros_like(p), (1.0, 1.0, 1.0))
    assert sd["distances_gt_to_pred"].size == 0
    assert sd["distances_pred_to_gt"].size == 0


def test_edge_touching_object():
    # an object flush against the far faces keeps its border elements there
    g = np.zeros((8, 8, 8), bool)
    g[5:, 5:, 5:] = True
    sd = compute_surface_distances(g, g, (1.0, 1.0, 1.0))
    # 3x3x3 cube: area is positive and bounded by the 6-face box area
    area = float(np.sum(sd["surfel_areas_gt"]))
    assert 0 < area <= 6 * 9.0


@pytest.mark.quick
def test_dim_mismatch_raises():
    m2 = np.zeros((4, 4), bool)
    m3 = np.zeros((4, 4, 4), bool)
    with pytest.raises(ValueError):
        compute_surface_distances(m3, m3, (1.0, 1.0))
    with pytest.raises(ValueError):
        compute_surface_distances(m2, m2, (1.0, 1.0, 1.0))
