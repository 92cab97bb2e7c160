"""gap_conv3x3 must equal mean(conv3x3_same(x, k)) exactly (f32)."""
import jax
import jax.numpy as jnp
import numpy as np

from csbsr_tpu.ops.gap_conv import gap_conv3x3
import pytest

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _dense(x, k):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.mean(y, axis=(1, 2))


def test_gap_conv3x3_matches_dense(rng):
    for (h, w, ci, co) in [(5, 7, 3, 4), (8, 8, 16, 9), (2, 2, 2, 2), (12, 3, 1, 5)]:
        x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32))
        got = gap_conv3x3(x, k)
        want = _dense(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-6)


def test_gap_conv3x3_grad_matches_dense(rng):
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 3).astype(np.float32))
    g1 = jax.grad(lambda k: jnp.sum(gap_conv3x3(x, k) ** 2))(k)
    g2 = jax.grad(lambda k: jnp.sum(_dense(x, k) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=2e-4, atol=1e-5)
