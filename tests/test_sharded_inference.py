"""Multi-device (serving-style) inference: the patch/batch axis shards over
the mesh and the jitted forward runs one program across all 8 virtual
devices — the TPU-native version of test-time DataParallel
(`/root/reference/test.py:73-76`)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_train_step import tiny_cfg
from csbsr_tpu.models import model_from_cfg
from csbsr_tpu.parallel.mesh import make_mesh, batch_sharding, replicated


@pytest.mark.quick
def test_sharded_inference_matches_single_device(rng):
    cfg = tiny_cfg(**{"INPUT.IMAGE_SIZE": [32, 32]})
    model = model_from_cfg(cfg)
    patches = jnp.asarray(rng.rand(16, 8, 8, 3).astype(np.float32))
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, None, False, train=False)
    )(jax.random.PRNGKey(0), patches)

    @jax.jit
    def infer(v, p):
        out = model.apply(v, p, None, False, train=False, clip_sr=True)
        return out["sr"], out["seg"]

    sr_ref, seg_ref = infer(variables, patches)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    v_sharded = jax.device_put(variables, replicated(mesh))
    p_sharded = jax.device_put(patches, batch_sharding(mesh))
    sr_sh, seg_sh = infer(v_sharded, p_sharded)

    # sharded execution is numerically identical (no BN batch coupling in
    # eval mode: running stats are used)
    np.testing.assert_allclose(np.asarray(sr_sh), np.asarray(sr_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_sh), np.asarray(seg_ref), atol=1e-5)
    # and the output really is sharded over the data axis
    assert len(sr_sh.sharding.device_set) == 8
