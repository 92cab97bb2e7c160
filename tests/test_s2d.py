"""Exactness tests: space-to-depth (de)conv lowering vs lax reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.ops.s2d import s2d_conv, s2d_deconv, can_s2d_conv, can_s2d_deconv

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


GEOMS = [(6, 2, 2), (8, 4, 2), (4, 2, 1), (2, 2, 0), (12, 8, 2)]


@pytest.mark.parametrize("k,s,p", GEOMS)
def test_s2d_conv_matches_lax(rng, k, s, p):
    if not can_s2d_conv(k, s, p):
        pytest.skip("geometry not lowerable")
    h = 2 * s * 3  # (h + 2p) % s == 0 given k % s == 0 and 2p adjusts; ensure
    if (h + 2 * p) % s != 0:
        h += s - (h + 2 * p) % s
    x = jnp.asarray(rng.rand(2, h, h, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 5, 7).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, w, (s, s), [(p, p), (p, p)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    ours = s2d_conv(x, w, s, p)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("k,s,p", GEOMS)
def test_s2d_deconv_matches_lax(rng, k, s, p):
    if not can_s2d_deconv(k, s, p):
        pytest.skip("geometry not lowerable")
    h = 6
    x = jnp.asarray(rng.rand(2, h, h, 5).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 7, 5).astype(np.float32) * 0.1)  # (k,k,O,I)
    ref = jax.lax.conv_transpose(
        x, w, (s, s), [(k - 1 - p, k - 1 - p)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
    )
    ours = s2d_deconv(x, w, s, p)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)
