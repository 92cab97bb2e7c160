"""Golden tests for the linear (Gaussian-conv) oriented-weight variants
(`/root/reference/model/utils/oriented_weight.py:26-44,61-70`), and the
config knob that selects them (TPU.ORIENTED_WEIGHT_VARIANT='linear')."""
import pytest
import numpy as np
import jax.numpy as jnp

from csbsr_tpu.losses import (
    crack_oriented_weight,
    oriented_gaussian_map,
    segment_failure_oriented_weight,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _ref_gaussian(size, sigma):
    r = size // 2
    g = np.linspace(-r, r, size).reshape(1, -1)
    xx = np.tile(g, (size, 1))
    yy = np.tile(g.T, (1, size))
    k = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    k = k / k.sum()
    return k / k.max()


def _ref_same_conv(img, k):
    """F.conv2d(img, k, padding=(ks-1)//2) == correlation; symmetric kernel
    so correlate == convolve."""
    from scipy.signal import convolve2d

    return convolve2d(img, k, mode="same")


def test_gaussian_map_matches_reference_formula():
    for size, sigma in ((7, 2.0), (21, 0.7)):
        # atol floor: the far tail underflows in f32 (the reference computes
        # in f64); those elements are ~1e-50 and numerically irrelevant
        np.testing.assert_allclose(
            np.asarray(oriented_gaussian_map(size, sigma)), _ref_gaussian(size, sigma),
            rtol=1e-5, atol=1e-12,
        )


def test_crack_oriented_weight_golden():
    rng = np.random.RandomState(3)
    gt = (rng.rand(2, 16, 16, 1) > 0.8).astype(np.float32)
    amp, bias, size, sigma = 2.0, 0.5, 7, 2.0
    out = np.asarray(crack_oriented_weight(jnp.asarray(gt), amp, bias, size, sigma))
    k = _ref_gaussian(size, sigma)
    for b in range(2):
        expected = amp * _ref_same_conv(gt[b, :, :, 0], k) + bias
        np.testing.assert_allclose(out[b, :, :, 0], expected, rtol=1e-4, atol=1e-5)


def test_segment_failure_oriented_weight_golden():
    rng = np.random.RandomState(4)
    gt = (rng.rand(1, 12, 12, 1) > 0.8).astype(np.float32)
    pred = rng.rand(1, 12, 12, 1).astype(np.float32)
    amp, bias, size, sigma = 1.5, 1.0, 7, 2.0
    out = np.asarray(segment_failure_oriented_weight(jnp.asarray(pred), jnp.asarray(gt), amp, bias, size, sigma))
    k = _ref_gaussian(size, sigma)
    expected = amp * _ref_same_conv(np.abs(pred - gt)[0, :, :, 0], k) + bias
    np.testing.assert_allclose(out[0, :, :, 0], expected, rtol=1e-4, atol=1e-5)


def test_linear_variant_selectable_in_loss_fn():
    import jax

    from tests.test_train_step import tiny_cfg
    from csbsr_tpu.engine.losses_glue import build_loss_fn
    from csbsr_tpu.engine.phase import phase_config_from_cfg, compute_phase

    cfg = tiny_cfg(**{
        "SOLVER.CRACK_ORIENTED_WEIGHT4SR_AMP": 2.0,
        "SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SR_AMP": 1.5,
        "SOLVER.ORIENTED_WEIGHT_ITER": 0,
        "TPU.ORIENTED_WEIGHT_VARIANT": "linear",
    })
    loss_fn = build_loss_fn(cfg)
    pc = phase_config_from_cfg(cfg, 100)
    rng = np.random.RandomState(5)
    b, hw, sf, k = 2, 32, 4, 7
    outputs = {
        "sr": jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32),
        "seg": jnp.asarray(rng.rand(b, hw, hw, 1), jnp.float32),
        "aux": None,
        "kernel": jnp.asarray(rng.rand(b, k * k), jnp.float32),
    }
    batch = {
        "hr": jnp.asarray(rng.rand(b, hw, hw, 3), jnp.float32),
        "lr": jnp.asarray(rng.rand(b, hw // sf, hw // sf, 3), jnp.float32),
        "seg": jnp.asarray((rng.rand(b, hw, hw, 1) > 0.8), jnp.float32),
        "kernel": jnp.asarray(rng.rand(b, k, k), jnp.float32),
    }
    losses = jax.jit(lambda o, ba: loss_fn(o, ba, compute_phase(50, pc)))(outputs, batch)
    assert np.isfinite(float(losses["total"]))
    assert float(losses["sr_loss"]) > 0
