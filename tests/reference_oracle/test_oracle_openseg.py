"""Oracles for two dormant openseg nets (VERDICT r4 #3c): SpatialOCRNet and
FcnNet from `/root/reference/model/modeling/hrnet_ocr/nets/{ocrnet,fcnet}.py`,
driven through the reference's own Configer + BackboneSelector path (with
the `lib.*` alias shim) over two different ResNet backbone rows — the
deep-base dilated8 ResNet-101 default and the plain-stem ResNet-50 — so the
resnet_zoo stem/bottleneck/dilation/downsample conventions are all pinned
against the real `resnet_models.py`.
"""
import json
import os

import numpy as np
import pytest

from . import shims, util

shims.install()
shims._fake_openseg_lib()

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


def _configer(tmp_path, backbone, num_classes=1):
    from model.modeling.hrnet_ocr.tools.set_config import set_configer

    src = "/root/reference/model/modeling/hrnet_ocr/config/H_48_D_4_composite.json"
    cfg_json = json.load(open(src))
    cfg_json["network"]["pretrained"] = None
    cfg_json["network"]["backbone"] = backbone
    cfg_json.setdefault("data", {})["num_classes"] = num_classes
    cfg_path = os.path.join(tmp_path, "openseg.json")
    json.dump(cfg_json, open(cfg_path, "w"))
    return set_configer(cfg_path)


def _patch_no_imagenet():
    """ResNetModels.* construct with pretrained=configer('network','pretrained')
    (nulled in our JSON) — but ModuleHelper.load_model tolerates None; keep a
    guard in case a zoo row tries a download anyway."""
    from model.modeling.hrnet_ocr.tools import module_helper

    module_helper.ModuleHelper.load_model = staticmethod(
        lambda model, pretrained=None, **kw: model)


def _run_pair(tmp_path, ref_cls, our_model, backbone, seed):
    # 62x62: keeps the reference's ceil_mode maxpool (resnet_models.py:140)
    # on an exact boundary so both frameworks produce the same grid
    with util.x64():
        variables = our_model.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, 62, 62, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_openseg_resnet)

        _patch_no_imagenet()
        ref = ref_cls(_configer(tmp_path, backbone)).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(50 + seed).rand(1, 3, 62, 62).astype(np.float64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        ours = our_model.apply(variables, util.nhwc(x), train=False)
        diffs = [util.max_abs_diff(r, o) for r, o in zip(ref_out, ours)]
    return diffs


@pytest.mark.slow
def test_spatial_ocrnet_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.ocrnet import SpatialOCRNet as Ref
    from csbsr_tpu.models.openseg import SpatialOCRNet

    diffs = _run_pair(tmp_path, Ref,
                      SpatialOCRNet(backbone="deepbase_resnet101_dilated8",
                                    dtype=jnp.float64),
                      "deepbase_resnet101_dilated8", 41)
    assert max(diffs) < 1e-8, f"SpatialOCRNet mismatch: {diffs}"


@pytest.mark.slow
def test_asp_ocrnet_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.ocrnet import ASPOCRNet as Ref
    from csbsr_tpu.models.openseg import ASPOCRNet

    diffs = _run_pair(tmp_path, Ref,
                      ASPOCRNet(backbone="resnet50_dilated8", dtype=jnp.float64),
                      "resnet50_dilated8", 43)
    assert max(diffs) < 1e-8, f"ASPOCRNet mismatch: {diffs}"


@pytest.mark.slow
def test_fcnnet_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.fcnet import FcnNet as Ref
    from csbsr_tpu.models.openseg import FcnNet

    diffs = _run_pair(tmp_path, Ref,
                      FcnNet(backbone="resnet50_dilated8", dtype=jnp.float64),
                      "resnet50_dilated8", 42)
    assert max(diffs) < 1e-8, f"FcnNet mismatch: {diffs}"
