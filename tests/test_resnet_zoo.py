"""Backbone zoo tests (resnet_zoo.py vs the reference arch table,
`/root/reference/model/modeling/hrnet_ocr/backbones/resnet/resnet_backbone.py:131-288`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from csbsr_tpu.models.resnet_zoo import ARCH_SPECS, ResNetZooBackbone
from csbsr_tpu.models.openseg import semantic_segmentor


def _shapes(arch, hw=32):
    m = ResNetZooBackbone(arch=arch)

    def f(r, x):
        return m.apply(m.init(r, x), x)

    out = jax.eval_shape(f, jax.random.PRNGKey(0),
                         jax.ShapeDtypeStruct((1, hw, hw, 3), jnp.float32))
    return [o.shape for o in out]


@pytest.mark.quick
def test_arch_table_complete():
    # EXACTLY the live entries of the reference dispatch
    # (resnet_backbone.py:137-288; dcn_* is dead code there, wsl_* is the
    # resnext101_32x*d architecture + a weights download)
    expected = set()
    for base in ("deepbase_resnet18", "resnet34", "resnet50",
                 "deepbase_resnet50", "resnet101", "deepbase_resnet101"):
        expected |= {base, f"{base}_dilated8", f"{base}_dilated16"}
    expected |= {"deepbase_resnet152_dilated8", "deepbase_resnet152_dilated16"}
    expected |= {f"resnext101_32x{w}d_dilated8" for w in (8, 16, 32, 48)}
    expected |= {f"deepbase_resnest{d}_dilated8" for d in (50, 101, 200, 269)}
    expected |= {f"wide_resnet{n}_dilated8" for n in (16, 20, 38)}
    assert expected == set(ARCH_SPECS)


def test_all_archs_build_abstractly():
    for arch, spec in sorted(ARCH_SPECS.items()):
        s = _shapes(arch)
        assert len(s) == 4, arch
        if "wide_structure" in spec:
            chans, strides = (512, 1024, 2048, 4096), (8, 8, 8, 8)
        else:
            exp = 1 if spec["block"] == "basic" else 4
            chans = tuple(c * exp for c in (64, 128, 256, 512))
            dil = spec["dilate"]
            strides = {1: (4, 8, 16, 32), 8: (4, 8, 8, 8), 16: (4, 8, 16, 16)}[dil]
        for shp, ch, st in zip(s, chans, strides):
            assert shp == (1, 32 // st, 32 // st, ch), (arch, s)


def test_deepbase_resnet101_param_paths_are_stable():
    """Checkpoint layout guard: the historical DeepBaseResNet101Dilated8
    names (stem1_conv, layerL_B/convK, ds_conv) must survive the zoo."""
    m = ResNetZooBackbone()  # default arch
    v = jax.eval_shape(
        lambda r, x: m.init(r, x),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32),
    )
    p = v["params"]
    assert p["stem1_conv"]["kernel"].shape == (3, 3, 3, 64)
    assert p["stem3_conv"]["kernel"].shape == (3, 3, 64, 128)
    assert p["layer1_0"]["conv1"]["kernel"].shape == (1, 1, 128, 64)
    assert p["layer1_0"]["ds_conv"]["kernel"].shape == (1, 1, 128, 256)
    assert p["layer3_22"]["conv3"]["kernel"].shape == (1, 1, 256, 1024)
    assert p["layer4_0"]["conv2"]["kernel"].shape == (3, 3, 512, 512)


def test_resnext_grouped_kernel():
    m = ResNetZooBackbone(arch="resnext101_32x8d_dilated8")
    v = jax.eval_shape(
        lambda r, x: m.init(r, x),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32),
    )
    # width = 64*(8/64)*32 = 256; grouped conv kernel in-ch = width/groups
    k = v["params"]["layer1_0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 256 // 32, 256)


def test_small_archs_forward():
    x = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    for arch in ("deepbase_resnet18_dilated8", "resnet34", "wide_resnet16_dilated8"):
        m = ResNetZooBackbone(arch=arch)
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        for o in out:
            assert np.isfinite(np.asarray(o)).all(), arch


def test_resnest_split_attention_forward():
    """radix-2 SplAtConv: forward is finite and attention sums to 1 over
    the radix axis by construction (softmax) - check output magnitude sane."""
    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    m = ResNetZooBackbone(arch="deepbase_resnest50_dilated8")
    v = m.init(jax.random.PRNGKey(2), x)
    out = m.apply(v, x)
    assert out[3].shape == (1, 4, 4, 2048)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()
    # odd feature maps: torch's ceil-mode avg_down (resnest_models.py:307)
    # keeps the residual and the avd main path shape-compatible at 36x36
    # (stem+pool -> 9x9), where floor-mode pooling would crash
    x_odd = np.random.RandomState(3).rand(1, 36, 36, 3).astype(np.float32)
    out_odd = m.apply(m.init(jax.random.PRNGKey(4), x_odd), x_odd)
    assert out_odd[1].shape == (1, 5, 5, 512)
    assert np.isfinite(np.asarray(out_odd[3])).all()


def test_net_with_alternate_backbone():
    """Registry nets accept backbone= (the configer 'network.backbone' knob)."""
    m = semantic_segmentor("fcnet", num_classes=2,
                           backbone="deepbase_resnet18_dilated8")
    x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
    v = m.init(jax.random.PRNGKey(3), x)
    aux, main = m.apply(v, x)
    assert main.shape == (1, 32, 32, 2)
    assert np.isfinite(np.asarray(main)).all()


@pytest.mark.quick
def test_unknown_arch_raises():
    m = ResNetZooBackbone(arch="senet154")
    with pytest.raises(NotImplementedError):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
