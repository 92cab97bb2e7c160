"""Banded-map conv chain vs dense reference (exactness)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from csbsr_tpu.ops.banded import (
    banded_from_vector,
    banded_conv3x3,
    banded_conv1x1,
    materialize,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _dense_conv(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_banded_chain_matches_dense(rng):
    b, h, w, c = 2, 17, 13, 5
    vec = jnp.asarray(rng.rand(b, c).astype(np.float32))
    k1 = jnp.asarray(rng.randn(3, 3, c, 6).astype(np.float32) * 0.3)
    k2 = jnp.asarray(rng.randn(3, 3, 6, 4).astype(np.float32) * 0.3)
    k3 = jnp.asarray(rng.randn(1, 1, 4, 3).astype(np.float32))
    bias1 = jnp.asarray(rng.randn(6).astype(np.float32))

    # dense reference: broadcast then conv chain with lrelu between
    dense = jnp.broadcast_to(vec[:, None, None, :], (b, h, w, c))
    dense = _dense_conv(dense, k1) + bias1
    dense = jax.nn.leaky_relu(dense, 0.01)
    dense = _dense_conv(dense, k2)
    dense = _dense_conv(dense, k3, pad=0)

    # banded chain
    bd = banded_from_vector(vec)
    bd = banded_conv3x3(bd, k1, bias1)
    bd = jax.nn.leaky_relu(bd, 0.01)  # elementwise ops are band-safe
    bd = banded_conv3x3(bd, k2)
    bd = banded_conv1x1(bd, k3)
    full = materialize(bd, h, w)

    np.testing.assert_allclose(np.asarray(full), np.asarray(dense), atol=1e-5)


def test_materialize_width0(rng):
    vec = jnp.asarray(rng.rand(3, 7).astype(np.float32))
    bd = banded_from_vector(vec)
    full = materialize(bd, 9, 11)
    assert full.shape == (3, 9, 11, 7)
    np.testing.assert_allclose(np.asarray(full[:, 4, 5]), np.asarray(vec))
