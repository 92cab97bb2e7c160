"""CrackFormer oracle against the REAL reference
(`model/modeling/crackformer.py`): local self-attention with the conv3d
positional embedding, argmax-index pooling/unpooling, LABlock gates, side
fusion — all in eval mode (DropPath/Dropout identity).
"""
import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.utils import translators  # noqa: E402
from csbsr_tpu.utils.torch_convert import export_params_to_torch_names  # noqa: E402


def test_crackformer_forward_matches_reference():
    from model.modeling.crackformer import CrackFormer as RefCrackFormer
    from csbsr_tpu.models.crackformer import CrackFormer

    with util.x64():
        model = CrackFormer(dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(13), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = {}
        for tree in (variables["params"], variables.get("batch_stats", {})):
            for k, v in export_params_to_torch_names(
                    tree, translators.translate_crackformer).items():
                sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())

        ref = RefCrackFormer().double().eval()
        # Dead reference parameters: Bottleneck.bn2 is never used in forward
        # (`crackformer.py:164-182`), and Down3/4/5 declare nn3 but apply nn2
        # twice instead (`crackformer.py:294-297,313-316,332-335`)
        util.load_strict_no_unexpected(
            ref, sd, allowed_missing=("num_batches_tracked", ".bn2.",
                                      "down3.nn3.", "down4.nn3.", "down5.nn3."))

        x = np.random.RandomState(9).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_fuse, ref_sides = ref(torch.from_numpy(x))
        fuse, sides = model.apply(variables, util.nhwc(x), train=False)
        fd = util.max_abs_diff(ref_fuse, fuse)
        sd_ = util.max_abs_diff(ref_sides, sides)
    assert fd < 1e-8, f"CrackFormer fuse mismatch: {fd}"
    assert sd_ < 1e-8, f"CrackFormer sides mismatch: {sd_}"
