"""Native C++ surface-distance kernel vs the numpy implementation."""
import numpy as np
import pytest

from csbsr_tpu.native import load, surface_metrics_native, edt_native
from csbsr_tpu.metrics.surface_distance import calc_distance_metrics

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


@pytest.fixture(scope="module")
def native_lib():
    lib = load()
    if lib is None:
        pytest.skip("native library not buildable")
    return lib


def test_native_edt_matches_scipy(native_lib, rng):
    from scipy.ndimage import distance_transform_edt

    mask = rng.rand(37, 53) > 0.95
    ours = edt_native(mask)
    ref = distance_transform_edt(~mask)
    np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_native_metrics_match_numpy(native_lib, rng):
    b, t, h, w = 2, 7, 40, 40
    preds = rng.rand(b, t, h, w) > 0.85
    gts = rng.rand(b, 1, h, w) > 0.85
    preds[0, 3] = False  # empty prediction -> outlier path
    hd_n, msd_n = surface_metrics_native(preds, gts)
    hd_p, msd_p = calc_distance_metrics(preds, gts, use_native=False)
    np.testing.assert_allclose(hd_n, hd_p, atol=1e-9)
    np.testing.assert_allclose(msd_n, msd_p, atol=1e-9)


def test_native_speedup(native_lib, rng):
    import time

    b, t, h, w = 1, 32, 128, 128
    preds = rng.rand(b, t, h, w) > 0.9
    gts = rng.rand(b, 1, h, w) > 0.9
    t0 = time.perf_counter()
    surface_metrics_native(preds, gts)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    calc_distance_metrics(preds, gts, use_native=False)
    t_numpy = time.perf_counter() - t0
    # multithreaded C++ should win comfortably; keep the bound loose for CI noise
    assert t_native < t_numpy
