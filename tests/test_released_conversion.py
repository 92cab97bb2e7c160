"""Released-weights conversion machinery, tested without the weights:

  - PSPNet_BlurSkip translator coverage (the last released recipe head)
  - ImageNet backbone translators (VGG16/ResNet34/HRNet-W48) fill exactly
    the backbone subtree via partial conversion
  - convert_joint_checkpoint: a synthetic full joint .pth-style state dict
    (sr_model.* + segmentation_model.*, module.-prefixed like DataParallel
    saves) round-trips bit-exactly into the flax pytree
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

from csbsr_tpu.utils import translators
from csbsr_tpu.utils.pretrained import convert_joint_checkpoint
from csbsr_tpu.utils.torch_convert import convert_tree, export_params_to_torch_names


@pytest.mark.quick
def test_pspnet_blurskip_translator_full_coverage():
    from csbsr_tpu.models.pspnet import PSPNetBlurSkip
    from tests.test_translators import _roundtrip

    m = PSPNetBlurSkip(n_classes=1, n_layer_blurskip=2)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 49)))
    _roundtrip(variables["params"], variables.get("batch_stats", {}),
               translators.translate_pspnet)


def _partial_fill_check(params, translate, expect_all_of=()):
    """Export the translatable subtree to torch names, perturb, convert back
    partial, and verify exactly those leaves changed."""
    sd = {k: v + 1.0 for k, v in export_params_to_torch_names(params, translate).items()}
    new_p, _, n = convert_tree(params, {}, sd, translate, partial=True)
    assert n == len(sd) and n > 0
    flat_old = traverse_util.flatten_dict(params)
    flat_new = traverse_util.flatten_dict(new_p)
    changed = {p for p in flat_old if np.abs(np.asarray(flat_new[p]) - np.asarray(flat_old[p])).max() > 1e-8}
    for path in flat_old:
        kind = {"kernel": "kernel", "bias": "bias", "scale": "scale",
                "alpha": "alpha", "embedding": "kernel"}.get(str(path[-1]), str(path[-1]))
        translated = translate(path, kind) is not None
        assert translated == (path in changed), path
    for frag in expect_all_of:
        assert any(frag in "/".join(map(str, p)) for p in changed), frag


def test_imagenet_vgg16_into_kbpn_feat():
    from csbsr_tpu.models.kbpn import KBPN

    m = KBPN(scale_factor=4, num_stages=2, estimate_ksize=7, ksize_output=7)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), None, False, train=False)["params"]
    # feat head comes from vgg features 0,2,5,7 (kbpn.py:42-44 drops pool 4)
    assert translators.imagenet_vgg16_kbpn_feat(("feat", "conv2", "conv", "kernel"), "kernel") == "features.5.weight"
    _partial_fill_check(params, translators.imagenet_vgg16_kbpn_feat, expect_all_of=("feat/conv0", "feat/conv3"))


def test_imagenet_vgg16_into_unet16_encoder():
    from csbsr_tpu.models.unet import UNet16

    m = UNet16(up_sampling_method="deconv")
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    assert translators.imagenet_vgg16_unet16(("enc4", "conv", "kernel"), "kernel") == "features.10.weight"
    assert translators.imagenet_vgg16_unet16(("enc12", "conv", "kernel"), "kernel") == "features.28.weight"
    _partial_fill_check(params, translators.imagenet_vgg16_unet16, expect_all_of=("enc0", "enc12"))


def test_imagenet_resnet34_into_pspnet():
    from csbsr_tpu.models.pspnet import PSPNet

    m = PSPNet(n_classes=1)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    t = translators.imagenet_resnet_pspnet
    assert t(("feats", "layer2_0", "downsample_conv", "kernel"), "kernel") == "layer2.0.downsample.0.weight"
    assert t(("psp", "bottleneck", "kernel"), "kernel") is None  # head untouched
    _partial_fill_check(variables["params"], t, expect_all_of=("feats/conv1", "feats/layer4"))


def test_imagenet_hrnet_w48():
    t = translators.imagenet_hrnet_w48
    assert t(("backbone", "conv1", "kernel"), "kernel") == "conv1.weight"
    assert (
        t(("backbone", "stage2_m0", "branch0_block1", "conv1", "kernel"), "kernel")
        == "stage2.0.branches.0.1.conv1.weight"
    )
    assert t(("cls_head", "kernel"), "kernel") is None


def test_convert_joint_checkpoint_roundtrip():
    from tests.test_train_step import tiny_cfg
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils.pretrained import sr_translator_for, seg_translator_for

    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "PSPNet", "INPUT.IMAGE_SIZE": [32, 32]})
    model = model_from_cfg(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 3)), None, False, train=False
    )
    params, stats = variables["params"], variables.get("batch_stats", {})

    # build the synthetic released checkpoint: module. + sr_model./segmentation_model.
    sd = {}
    for mod, translate in (("sr_model", sr_translator_for(cfg)),
                           ("segmentation_model", seg_translator_for(cfg))):
        for k, v in export_params_to_torch_names(params[mod], translate).items():
            sd[f"module.{mod}.{k}"] = np.asarray(v) * 0.5 + 0.25
        if stats.get(mod):
            for k, v in export_params_to_torch_names(stats[mod], translate).items():
                sd[f"module.{mod}.{k}"] = np.asarray(v) * 0.5 + 0.25

    new_params, new_stats = convert_joint_checkpoint(cfg, params, stats, sd, log_fn=lambda *a: None)
    for mod, translate in (("sr_model", sr_translator_for(cfg)),
                           ("segmentation_model", seg_translator_for(cfg))):
        flat_old = traverse_util.flatten_dict(params[mod])
        flat_new = traverse_util.flatten_dict(new_params[mod])
        for path in flat_old:
            np.testing.assert_allclose(
                np.asarray(flat_new[path]),
                np.asarray(flat_old[path]) * 0.5 + 0.25,
                rtol=1e-6, err_msg=str(path),
            )


def test_dsrl_pth_load_path(tmp_path, monkeypatch):
    """load_pretrained_dsrl consumes a weights/DSRL.pth-style checkpoint
    (build_model.py:345-349) written with the reference's key names."""
    torch = pytest.importorskip("torch")
    from tests.test_train_step import tiny_cfg
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils.pretrained import load_pretrained_dsrl

    cfg = tiny_cfg(**{
        "MODEL.SR": "DSRL", "MODEL.DETECTOR_TYPE": "DSRL",
        "MODEL.DSRL_UPSAMPLE": "bilinear", "SOLVER.SR_LOSS_FUNC": "L1",
        "SOLVER.SEG_LOSS_FUNC": "Dice", "INPUT.IMAGE_SIZE": [32, 32],
    })
    model = model_from_cfg(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 3)), None, False, train=False
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    t = translators.make_translate_dsrl(cfg.MODEL.SCALE_FACTOR)
    sd = {k: torch.from_numpy(np.asarray(v) * 0.5 + 0.25)
          for k, v in export_params_to_torch_names(params["parallel_model"], t).items()}
    if stats.get("parallel_model"):
        sd.update({k: torch.from_numpy(np.asarray(v) * 0.5 + 0.25)
                   for k, v in export_params_to_torch_names(stats["parallel_model"], t).items()})
    (tmp_path / "weights").mkdir()
    torch.save(sd, tmp_path / "weights" / "DSRL.pth")
    monkeypatch.chdir(tmp_path)

    logs = []
    new_p, new_s = load_pretrained_dsrl(cfg, params, stats, log_fn=logs.append)
    assert any("DSRL pretrained model was loaded" in m for m in logs), logs
    flat_old = traverse_util.flatten_dict(params["parallel_model"])
    flat_new = traverse_util.flatten_dict(new_p["parallel_model"])
    for path in flat_old:
        np.testing.assert_allclose(
            np.asarray(flat_new[path]), np.asarray(flat_old[path]) * 0.5 + 0.25,
            rtol=1e-6, err_msg=str(path),
        )


@pytest.mark.quick
def test_convert_joint_checkpoint_rejects_incomplete():
    from tests.test_train_step import tiny_cfg
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils.torch_convert import ConversionError

    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "PSPNet", "INPUT.IMAGE_SIZE": [32, 32]})
    model = model_from_cfg(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8, 8, 3)), None, False, train=False
    )
    with pytest.raises(ConversionError):
        convert_joint_checkpoint(
            cfg, variables["params"], variables.get("batch_stats", {}),
            {"sr_model.feat.0.weight": np.zeros((64, 3, 3, 3), np.float32)},
            log_fn=lambda *a: None,
        )
