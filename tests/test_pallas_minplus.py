"""Pallas min-plus EDT row pass (interpret mode) vs the XLA implementation."""
import numpy as np
import jax.numpy as jnp

from csbsr_tpu.ops.edt import _scan_1d_distance, _min_plus_rows
from csbsr_tpu.ops.pallas.minplus import minplus_rows_pallas
import pytest

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def test_minplus_pallas_matches_xla(rng):
    mask = jnp.asarray(rng.rand(2, 1, 33, 47) > 0.9)
    g = _scan_1d_distance(mask)
    ref = np.asarray(_min_plus_rows(g))
    ours = np.asarray(minplus_rows_pallas(g, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_minplus_pallas_128_aligned(rng):
    mask = jnp.asarray(rng.rand(3, 128, 128) > 0.97)
    g = _scan_1d_distance(mask)
    ref = np.asarray(_min_plus_rows(g))
    ours = np.asarray(minplus_rows_pallas(g, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
