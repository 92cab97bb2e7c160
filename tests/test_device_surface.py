"""Device HD/MSD vs the host (scipy) parity oracle.

The host implementation (metrics/surface_distance.py) mirrors the vendored
DeepMind package; distance_metrics_device must reproduce it across random
masks, threshold banks, empty/edge cases.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from csbsr_tpu.metrics.surface_distance import calc_distance_metrics
from csbsr_tpu.metrics.device_surface import distance_metrics_device


def _blobby(rng, h, w, thresh=0.6):
    """Smooth random field -> realistic connected blobs."""
    from scipy import ndimage

    f = ndimage.gaussian_filter(rng.rand(h, w), 4)
    f = (f - f.min()) / (f.max() - f.min() + 1e-9)
    return f > thresh


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host_random_banks(seed):
    rng = np.random.RandomState(seed)
    h = w = 48
    gt = _blobby(rng, h, w)
    # a probability field binarised at several thresholds = the AIU bank
    from scipy import ndimage

    prob = ndimage.gaussian_filter(rng.rand(h, w), 3)
    prob = (prob - prob.min()) / (prob.max() - prob.min() + 1e-9)
    ths = np.linspace(0.05, 0.95, 9)
    bank = (prob[None] > ths[:, None, None])  # (T, H, W)

    hd_host, msd_host = calc_distance_metrics(
        bank[None], gt[None, None], percentile=50, use_native=False
    )
    hd_dev, msd_dev = distance_metrics_device(
        jnp.asarray(bank[None]), jnp.asarray(gt[None]), percentile=50.0
    )
    np.testing.assert_allclose(np.asarray(hd_dev), hd_host, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(msd_dev), msd_host, rtol=1e-4, atol=1e-3)


@pytest.mark.quick
def test_device_empty_conventions():
    h = w = 32
    empty = np.zeros((h, w), bool)
    blob = np.zeros((h, w), bool)
    blob[10:20, 12:22] = True
    # (pred, gt): (empty, empty) -> 0; (blob, empty)/(empty, blob) -> max side
    bank = np.stack([empty, blob, empty])[None]  # (1, 3, H, W)
    gts = np.stack([empty, empty, blob])  # per-case gt; run case by case
    for j in range(3):
        hd, msd = distance_metrics_device(
            jnp.asarray(bank[:, j : j + 1]), jnp.asarray(gts[j][None])
        )
        hd_host, msd_host = calc_distance_metrics(
            bank[:, j : j + 1], gts[j][None, None], use_native=False
        )
        np.testing.assert_allclose(np.asarray(hd), hd_host, atol=1e-4)
        np.testing.assert_allclose(np.asarray(msd), msd_host, atol=1e-4)


def test_device_edge_touching_objects():
    """Objects touching image edges exercise the reference's zero-pad-crop
    window convention (the (H+1, W+1) grid)."""
    h = w = 24
    gt = np.zeros((h, w), bool)
    gt[0:8, 0:8] = True  # touches top-left
    pred = np.zeros((h, w), bool)
    pred[h - 9 :, w - 9 :] = True  # touches bottom-right
    hd_host, msd_host = calc_distance_metrics(
        pred[None, None], gt[None, None], use_native=False
    )
    hd_dev, msd_dev = distance_metrics_device(
        jnp.asarray(pred[None, None]), jnp.asarray(gt[None])
    )
    np.testing.assert_allclose(np.asarray(hd_dev), hd_host, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(msd_dev), msd_host, rtol=1e-4, atol=1e-3)


def test_device_percentiles():
    rng = np.random.RandomState(7)
    gt = _blobby(rng, 40, 40, 0.55)
    pred = _blobby(rng, 40, 40, 0.65)
    for pct in (50.0, 95.0, 100.0):
        hd_host, _ = calc_distance_metrics(
            pred[None, None], gt[None, None], percentile=pct, use_native=False
        )
        hd_dev, _ = distance_metrics_device(
            jnp.asarray(pred[None, None]), jnp.asarray(gt[None]), percentile=pct
        )
        np.testing.assert_allclose(np.asarray(hd_dev), hd_host, rtol=1e-4, atol=1e-3)


def test_zero_padding_invariance():
    """Bucket-padding (engine/inference.py device path) must be exact:
    zero-padded masks + max_len override == unpadded scores, including the
    one-empty outlier (= max of the ORIGINAL size, not the padded one)."""
    from csbsr_tpu.metrics.device_surface import distance_metrics_banked

    rng = np.random.RandomState(3)
    h, w = 48, 40
    gt = _blobby(rng, h, w)
    from scipy import ndimage

    prob = ndimage.gaussian_filter(rng.rand(h, w), 3)
    prob = (prob - prob.min()) / (prob.max() - prob.min() + 1e-9)
    # 1.5 > max(prob)=1.0 binarises to an empty prediction -> exercises the
    # one-empty outlier value
    ths = np.asarray([0.2, 0.5, 0.8, 1.5])

    hd0, msd0 = distance_metrics_banked(
        jnp.asarray(prob[None]), jnp.asarray(gt[None]), jnp.asarray(ths)
    )
    ph, pw = 64, 64
    pad = [(0, 0), (0, ph - h), (0, pw - w)]
    hd1, msd1 = distance_metrics_banked(
        jnp.pad(jnp.asarray(prob[None]), pad),
        jnp.pad(jnp.asarray(gt[None]), pad),
        jnp.asarray(ths),
        max_len=jnp.float32(max(h, w)),
    )
    np.testing.assert_allclose(np.asarray(hd1), np.asarray(hd0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(msd1), np.asarray(msd0), rtol=1e-5, atol=1e-5)
    assert np.asarray(hd1)[0, -1] == max(h, w)
