"""Oracles for the HRNet sibling heads (VERDICT r4 #3c): HRNet_W48 (plain
FCN head), HRNet_W48_ASPOCR, HRNet_W48_OCR_B from
`/root/reference/model/modeling/hrnet_ocr/nets/hrnet.py:22,56,161`.

The reference nets import their own modules by the upstream openseg package
name `lib.models.*` (absent from the tree); shims._fake_openseg_lib aliases
those names onto the identical vendored modules so the REAL classes run.
All three hard-code in_channels=720, so only the hrnet48 backbone row is
loadable — each test is a full W48 construction, marked slow like the
HRNet-OCR oracle.
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


def _configer(tmp_path, num_classes=1):
    from model.modeling.hrnet_ocr.tools.set_config import set_configer

    src = "/root/reference/model/modeling/hrnet_ocr/config/H_48_D_4_composite.json"
    cfg_json = json.load(open(src))
    cfg_json["network"]["pretrained"] = None
    cfg_json.setdefault("data", {})["num_classes"] = num_classes
    cfg_path = os.path.join(tmp_path, "hrnet_sibling.json")
    json.dump(cfg_json, open(cfg_path, "w"))
    return set_configer(cfg_path)


def _run_pair(tmp_path, ref_cls, our_model, seed, n_outputs):
    """Init ours, export by translate_hrnet_ocr, load into the real torch
    net with unexpected_keys==0, run both on the same input in f64."""
    with util.x64():
        variables = our_model.init(jax.random.PRNGKey(seed),
                                   jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_hrnet_ocr)

        ref = ref_cls(_configer(tmp_path)).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(40 + seed).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x))
        ours = our_model.apply(variables, util.nhwc(x), train=False)
        if n_outputs == 1:
            ref_out, ours = (ref_out,), (ours,)
        diffs = [util.max_abs_diff(r, o) for r, o in zip(ref_out, ours)]
    return diffs


@pytest.mark.slow
def test_hrnet_w48_plain_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.hrnet import HRNet_W48 as Ref
    from csbsr_tpu.models.hrnet_ocr import HRNetW48

    diffs = _run_pair(tmp_path, Ref, HRNetW48(width=48, dtype=jnp.float64), 31, 1)
    assert max(diffs) < 1e-8, f"HRNet_W48 mismatch: {diffs}"


@pytest.mark.slow
def test_hrnet_w48_aspocr_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.hrnet import HRNet_W48_ASPOCR as Ref
    from csbsr_tpu.models.hrnet_ocr import HRNetW48ASPOCR

    diffs = _run_pair(tmp_path, Ref, HRNetW48ASPOCR(width=48, dtype=jnp.float64),
                      32, 2)  # (out_aux, out)
    assert max(diffs) < 1e-8, f"HRNet_W48_ASPOCR mismatch: {diffs}"


@pytest.mark.slow
def test_hrnet_w48_ocr_b_matches_reference(tmp_path):
    from model.modeling.hrnet_ocr.nets.hrnet import HRNet_W48_OCR_B as Ref
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCRB

    diffs = _run_pair(tmp_path, Ref, HRNetW48OCRB(width=48, dtype=jnp.float64),
                      33, 2)  # (out_aux, out)
    assert max(diffs) < 1e-8, f"HRNet_W48_OCR_B mismatch: {diffs}"
