"""Translator coverage: every param leaf of each model maps to a torch key,
and export -> convert-back round-trips identically."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from csbsr_tpu.utils.torch_convert import convert_tree, export_params_to_torch_names
from csbsr_tpu.utils import translators

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _roundtrip(params, batch_stats, translate, allow_missing=()):
    flat = traverse_util.flatten_dict(params)
    untranslated = []
    for path in flat:
        kind = {"kernel": "kernel", "bias": "bias", "scale": "scale",
                "alpha": "alpha", "embedding": "kernel"}.get(str(path[-1]), str(path[-1]))
        if translate(path, kind) is None and not any(a in "/".join(map(str, path)) for a in allow_missing):
            untranslated.append("/".join(map(str, path)))
    assert not untranslated, f"untranslated leaves: {untranslated[:10]}"

    sd = export_params_to_torch_names(params, translate)
    back, _ = convert_tree(params, {}, sd, translate)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_kbpn_translator_full_coverage():
    from csbsr_tpu.models.kbpn import KBPN

    m = KBPN(scale_factor=4, num_stages=2, estimate_ksize=7, ksize_output=7)
    x = jnp.zeros((1, 8, 8, 3))
    params = m.init(jax.random.PRNGKey(0), x, None, False, train=False)["params"]
    _roundtrip(params, {}, translators.translate_kbpn)


def test_dbpn_translator_full_coverage():
    from csbsr_tpu.models.dbpn import DBPN

    m = DBPN(scale_factor=4, num_stages=4)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    _roundtrip(params, {}, translators.translate_dbpn)


def test_unet16_translator_full_coverage():
    from csbsr_tpu.models.unet import UNet16

    m = UNet16(up_sampling_method="deconv")
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    _roundtrip(params, {}, translators.translate_unet16)


def test_pspnet_translator_full_coverage():
    from csbsr_tpu.models.pspnet import PSPNet

    m = PSPNet(n_classes=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_pspnet)


def test_hrnet_ocr_translator_full_coverage():
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCR

    m = HRNetW48OCR(num_classes=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_hrnet_ocr)


def test_crackformer_translator_full_coverage():
    from csbsr_tpu.models.crackformer import CrackFormer

    m = CrackFormer()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_crackformer)


def test_srcnet_sr_translator_full_coverage():
    from csbsr_tpu.models.srcnet import SrcNetSR

    m = SrcNetSR(scale_factor=4, n_groups=2, n_blocks=3)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))["params"]
    _roundtrip(params, {}, translators.translate_srcnet_sr)


def test_segnet_translator_full_coverage():
    from csbsr_tpu.models.srcnet import SegNet

    m = SegNet()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_segnet)


def test_segnet_decoder_order_mapping():
    """flax De{s}{j} (application order) maps to torch descending indices."""
    t = translators.translate_segnet
    assert t(("convDe51", "conv", "kernel"), "kernel") == "ConvDe53.weight"
    assert t(("convDe53", "conv", "kernel"), "kernel") == "ConvDe51.weight"
    assert t(("bnDe42", "scale"), "scale") == "BNDe42.weight"
    assert t(("convDe21", "conv", "kernel"), "kernel") == "ConvDe22.weight"
    assert t(("convDe11", "conv", "kernel"), "kernel") == "ConvDe12.weight"
    assert t(("convDe1f", "kernel"), "kernel") == "ConvDe11.weight"


def test_dsrl_translator_full_coverage():
    from csbsr_tpu.models.dsrl import DSRL

    m = DSRL(num_classes=1, scale_factor=4)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_dsrl)


def test_dsrl_drn_translator_full_coverage():
    from csbsr_tpu.models.dsrl import DSRL

    m = DSRL(num_classes=1, scale_factor=4, backbone="drn")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_dsrl)
    # drn name spot checks (drn.py Sequential indices)
    t = translators.translate_dsrl
    assert t(("backbone", "layer0_conv", "kernel"), "kernel") == "backbone.layer0.0.weight"
    assert t(("backbone", "layer7_bn0", "scale"), "scale") == "backbone.layer7.1.weight"
    assert t(("backbone", "layer5_2", "conv2", "kernel"), "kernel") == "backbone.layer5.2.conv2.weight"


def test_dsrl_drn_forward_shapes(rng):
    from csbsr_tpu.models.dsrl import DSRL

    m = DSRL(num_classes=1, scale_factor=4, backbone="drn")
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    seg, sr, fea_seg, fea_sr = m.apply(variables, x)
    assert seg.shape == (1, 128, 128, 1)
    assert sr.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_dsrl_x2_offset():
    t = translators.make_translate_dsrl(2)
    assert t(("up_sr_0", "kernel"), "kernel") == "up_sr_1.weight"
    assert t(("up_edsr_2", "conv0", "kernel"), "kernel") == "up_edsr_3.conv.0.weight"


def test_dsrl_mobilenet_xception_forward_shapes(rng):
    from csbsr_tpu.models.dsrl import DSRL

    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    for backbone in ("mobilenet", "xception"):
        m = DSRL(num_classes=1, scale_factor=4, backbone=backbone)
        variables = m.init(jax.random.PRNGKey(0), x)
        seg, sr, fea_seg, fea_sr = m.apply(variables, x)
        assert seg.shape == (1, 128, 128, 1), backbone
        assert sr.shape == (1, 128, 128, 3), backbone
        assert np.isfinite(np.asarray(sr)).all(), backbone


def test_dsrl_backbone_feature_channels(rng):
    from csbsr_tpu.models.dsrl import AlignedXceptionOS16, MobileNetV2OS16

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    m = MobileNetV2OS16()
    v = m.init(jax.random.PRNGKey(0), x)
    f, low = m.apply(v, x)
    assert f.shape == (1, 4, 4, 320) and low.shape == (1, 16, 16, 24)
    m = AlignedXceptionOS16()
    v = m.init(jax.random.PRNGKey(0), x)
    f, low = m.apply(v, x)
    assert f.shape == (1, 4, 4, 2048) and low.shape == (1, 16, 16, 128)
