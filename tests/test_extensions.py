"""Extension-zoo equivalents: numeric/behavioural tests."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.models.extensions import (
    CrissCrossAttention,
    DeformConv2d,
    deform_conv2d,
    PacConv2d,
    SwitchNorm2d,
    FilterResponseNorm,
)


@pytest.mark.quick
def test_criss_cross_shapes_and_identity_at_init(rng):
    m = CrissCrossAttention()
    x = jnp.asarray(rng.rand(2, 8, 10, 16).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    # gamma inits to 0 => identity residual
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_deform_conv_zero_offset_equals_conv(rng):
    """With zero offsets and no mask, DCN must equal a standard conv."""
    x = rng.rand(2, 9, 9, 4).astype(np.float32)
    w = (rng.randn(3, 3, 4, 6) * 0.2).astype(np.float32)
    offset = np.zeros((2, 9, 9, 18), np.float32)
    ours = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


def test_deform_conv_integer_shift(rng):
    """Offset (0, +1) on every tap shifts the sampling grid right by one."""
    x = rng.rand(1, 8, 8, 2).astype(np.float32)
    w = (rng.randn(3, 3, 2, 3) * 0.2).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = +1
    ours = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(w))
    x_shift = np.zeros_like(x)
    x_shift[:, :, :-1] = x[:, :, 1:]  # shift left = sample right
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(w), (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # interior matches exactly; borders differ (zero-pad vs shifted view)
    np.testing.assert_allclose(
        np.asarray(ours)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2], atol=1e-4
    )


def test_modulated_dcn_module(rng):
    m = DeformConv2d(8, modulated=True)
    x = jnp.asarray(rng.rand(1, 8, 8, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_pac_conv_uniform_guide_equals_conv(rng):
    """A constant guide makes the adaptive kernel all-ones => plain conv."""
    x = rng.rand(1, 8, 8, 3).astype(np.float32)
    guide = np.ones((1, 8, 8, 2), np.float32)
    m = PacConv2d(5)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(guide))
    out = m.apply(v, jnp.asarray(x), jnp.asarray(guide))
    w = v["params"]["kernel"].reshape(3, 3, 3, 5)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), w, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # borders differ: the guide unfold zero-pads (affinity < 1 there)
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-1], np.asarray(ref)[:, 1:-1, 1:-1], atol=1e-4
    )


@pytest.mark.quick
def test_switch_norm_normalises(rng):
    m = SwitchNorm2d()
    x = jnp.asarray((rng.rand(4, 8, 8, 6) * 5 + 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert abs(out.mean()) < 0.2 and abs(out.std() - 1.0) < 0.2


def test_frn_shapes(rng):
    m = FilterResponseNorm()
    x = jnp.asarray(rng.rand(2, 8, 8, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert out.shape == x.shape
    assert (out >= 0).all()  # tau inits 0, gamma 1, beta 0 -> relu-like


@pytest.mark.quick
def test_matlab_metrics(rng):
    from csbsr_tpu.metrics.matlab import calculate_psnr, calculate_ssim, imresize, rgb2ycbcr

    a = rng.rand(32, 32, 3)
    b = np.clip(a + rng.randn(32, 32, 3) * 0.05, 0, 1)
    p = calculate_psnr(a, b, crop_border=2, test_y_channel=True)
    assert 15 < p < 45
    s = calculate_ssim(a, b)
    assert 0 < s <= 1
    assert calculate_psnr(a, a) == float("inf")
    # imresize shape + energy preservation on smooth content
    down = imresize(np.ones((16, 16)), 0.25)
    assert down.shape == (4, 4)
    np.testing.assert_allclose(down, 1.0, atol=1e-9)
    y = rgb2ycbcr(np.ones((2, 2, 3)))
    np.testing.assert_allclose(y, (65.481 + 128.553 + 24.966 + 16) / 255.0, atol=1e-9)
