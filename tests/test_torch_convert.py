"""Structural round-trip tests for the torch<->flax converter."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from csbsr_tpu.utils.torch_convert import (
    convert_tree,
    export_params_to_torch_names,
    strip_prefixes,
    translate_vgg_feat,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def test_vgg_feat_roundtrip(rng):
    from csbsr_tpu.models.kbpn import VGGFeat

    m = VGGFeat()
    x = jnp.zeros((1, 8, 8, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]

    # export to torch names, then convert back: must be identical
    torch_sd = export_params_to_torch_names(params, translate_vgg_feat)
    assert set(torch_sd) == {f"feat.{i}.{s}" for i in (0, 2, 4, 6) for s in ("weight", "bias")}
    assert torch_sd["feat.0.weight"].shape == (64, 3, 3, 3)  # torch OIHW

    back, _ = convert_tree(params, {}, torch_sd, translate_vgg_feat)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_strip_prefixes():
    sd = {"module.sr_model.feat.0.weight": 1, "feat.2.bias": 2}
    out = strip_prefixes(sd)
    assert set(out) == {"feat.0.weight", "feat.2.bias"}
