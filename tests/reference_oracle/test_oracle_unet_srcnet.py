"""UNet16 / SrcNetSR / SegNet oracles against the REAL reference modules
(`model/modeling/unet.py`, `model/modeling/srcnet.py`).
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


def _export_f64(params, translate, stats=None):
    sd = {}
    for tree in (params,) + ((stats,) if stats else ()):
        for k, v in export_params_to_torch_names(tree, translate).items():
            sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())
    return sd


@pytest.mark.parametrize("method", ["deconv", "interpolate", "pixel_shuffle"])
def test_unet16_forward_matches_reference(method):
    from model.modeling.unet import UNet16 as RefUNet16
    from csbsr_tpu.models.unet import UNet16

    with util.x64():
        model = UNet16(up_sampling_method=method, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables["params"], translators.translate_unet16)

        ref = RefUNet16(num_classes=1, pretrained=False,
                        up_sampling_method=method).double().eval()
        # the torch net registers the vgg encoder twice (self.encoder AND
        # conv1..conv5 share tensors, `unet.py:143-176`); loading the conv*
        # aliases fills the shared storage, so encoder.* may stay "missing"
        util.load_strict_no_unexpected(
            ref, sd, allowed_missing=("num_batches_tracked", "encoder."))

        x = np.random.RandomState(2).rand(2, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        out = model.apply(variables, util.nhwc(x))
        diff = util.max_abs_diff(ref_out, out)
    assert diff < 1e-8, f"UNet16[{method}] mismatch: {diff}"


@pytest.mark.slow
def test_srcnet_sr_forward_matches_reference():
    from model.modeling.srcnet import SrcNetSR as RefSrcNetSR
    from csbsr_tpu.models.srcnet import SrcNetSR

    with util.x64():
        model = SrcNetSR(scale_factor=4, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 8, 8, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables["params"], translators.translate_srcnet_sr)

        ref_cfg = util.ref_cfg(["MODEL.SCALE_FACTOR", 4,
                                "INPUT.IMAGE_SIZE", (32, 32)])
        ref = RefSrcNetSR(ref_cfg).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(4).rand(1, 3, 8, 8).astype(np.float64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        out = model.apply(variables, util.nhwc(x))
        diff = util.max_abs_diff(ref_out, out)
    assert diff < 1e-8, f"SrcNetSR mismatch: {diff}"


def test_segnet_forward_matches_reference():
    from model.modeling.srcnet import SegNet as RefSegNet
    from csbsr_tpu.models.srcnet import SegNet

    with util.x64():
        model = SegNet(dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables["params"], translators.translate_segnet,
                         stats=variables.get("batch_stats"))

        ref = RefSegNet().double().eval()
        # BNDe11 is declared by the reference but never used in forward
        # (`srcnet.py:177,243` — ConvDe11 output goes straight to sigmoid)
        util.load_strict_no_unexpected(
            ref, sd, allowed_missing=("num_batches_tracked", "BNDe11."))

        # eval mode: torch uses running stats; ours (init mean=0, var=1) were
        # exported, so both sides normalise identically
        x = np.random.RandomState(8).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        out = model.apply(variables, util.nhwc(x), train=False)
        diff = util.max_abs_diff(ref_out, out)
    assert diff < 1e-8, f"SegNet mismatch: {diff}"
