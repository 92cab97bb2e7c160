"""HRNet-W48+OCR and DSRL (DeepLabx4) oracles against the REAL reference
modules (`hrnet_ocr/nets/hrnet.py`, `DSRL/deeplab.py`).

Both are heavyweight constructions — marked slow; the quick tier's
conversion coverage comes from the KBPN/DBPN/UNet/PSPNet/CrackFormer
oracles which share the same translator/exporter machinery.
"""
import json
import os

import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.utils import translators  # noqa: E402
from csbsr_tpu.utils.torch_convert import export_params_to_torch_names  # noqa: E402


def _export_f64(variables, translate):
    sd = {}
    for tree in (variables["params"], variables.get("batch_stats", {})):
        for k, v in export_params_to_torch_names(tree, translate).items():
            sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())
    return sd


@pytest.mark.slow
def test_hrnet_w48_ocr_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.tools.set_config import set_configer
    from model.modeling.hrnet_ocr.nets.hrnet import HRNet_W48_OCR as RefHRNet
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCR

    # the shipped JSON points at an ImageNet .pth; null it (weights are
    # overwritten from our export anyway)
    src = "/root/reference/model/modeling/hrnet_ocr/config/H_48_D_4_composite.json"
    cfg_json = json.load(open(src))
    cfg_json["network"]["pretrained"] = None
    cfg_path = os.path.join(tmp_path, "hrnet.json")
    json.dump(cfg_json, open(cfg_path, "w"))

    with util.x64():
        model = HRNetW48OCR(width=48, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(21), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_hrnet_ocr)

        configer = set_configer(cfg_path)
        ref = RefHRNet(configer).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(14).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_main, ref_aux = ref(torch.from_numpy(x))
        main, aux = model.apply(variables, util.nhwc(x), train=False)
        md = util.max_abs_diff(ref_main, main)
        ad = util.max_abs_diff(ref_aux, aux)
    assert md < 1e-8, f"HRNet-OCR main mismatch: {md}"
    assert ad < 1e-8, f"HRNet-OCR aux mismatch: {ad}"


@pytest.mark.slow
def test_dsrl_deeplabx4_matches_reference():
    shims.patch_dsrl_no_imagenet()
    from model.modeling.DSRL.deeplab import DeepLabx4 as RefDeepLabx4
    from csbsr_tpu.models.dsrl import DSRL

    with util.x64():
        model = DSRL(num_classes=1, scale_factor=4, backbone="resnet", dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(22), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_dsrl)

        ref = RefDeepLabx4(backbone="resnet", num_classes=1, sync_bn=False).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(15).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            r_seg, r_sr, r_fea_seg, r_fea_sr = ref(torch.from_numpy(x))
        seg, sr, fea_seg, fea_sr = model.apply(variables, util.nhwc(x), train=False)
        diffs = {
            "seg": util.max_abs_diff(r_seg, seg),
            "sr": util.max_abs_diff(r_sr, sr),
            "fea_seg": util.max_abs_diff(r_fea_seg, fea_seg),
            "fea_sr": util.max_abs_diff(r_fea_sr, fea_sr),
        }
    bad = {k: v for k, v in diffs.items() if v > 1e-8}
    assert not bad, f"DSRL mismatches: {bad}"
