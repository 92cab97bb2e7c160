"""DBPN oracle: our flax DBPN + translate_dbpn vs the REAL reference
`model/modeling/dbpn.py` Net_2/Net_4 loaded from our exported weights.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.mark.parametrize("num_stages,net_name", [(2, "Net_2"), (4, "Net_4")])
def test_dbpn_forward_matches_reference(num_stages, net_name):
    from model.modeling import dbpn as ref_dbpn  # real reference module
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils import translators

    shared = [
        "MODEL.SR", "DBPN",
        "MODEL.SCALE_FACTOR", 4,
        "MODEL.NUM_STAGES", num_stages,
    ]
    cfg = util.our_cfg(shared, ours_only=["DATASET.ONLY_IMAGES", True,
                                          "TPU.COMPUTE_DTYPE", "float32"])

    with util.x64():
        model = model_from_cfg(cfg, dtype=jnp.float64)
        x0 = jnp.zeros((1, 16, 16, 3), jnp.float64)
        variables = model.init({"params": jax.random.PRNGKey(7)}, x0, None,
                               False, train=False)
        variables = util.promote_f64(variables)
        sd = util.export_module(variables, "sr_model", translators.translate_dbpn)

        ref_net = getattr(ref_dbpn, net_name)(4, 3).double().eval()
        util.load_strict_no_unexpected(ref_net, sd)

        x = np.random.RandomState(0).rand(2, 3, 16, 16).astype(np.float64)
        with torch.no_grad():
            ref_sr = ref_net(torch.from_numpy(x))
        out = model.apply(variables, util.nhwc(x), None, False, train=False)
        diff = util.max_abs_diff(ref_sr, out["sr"])
    assert diff < 1e-8, f"DBPN {net_name} mismatch: max|diff|={diff}"
