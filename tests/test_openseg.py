"""openseg net zoo: forward-shape/behaviour tests (nets/ocrnet.py etc.)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.models.openseg import (
    ASPOCRNet,
    AspOCNet,
    BaseOCNet,
    CE2POCRNet,
    DeepBaseResNet101Dilated8,
    FcnNet,
    ISANet,
    IdealSpatialOCRNet,
    SegFixHRNet,
    SpatialOCRNet,
    offset_sample,
)


def _init_apply(m, *args):
    v = m.init({"params": jax.random.PRNGKey(0)}, *args)
    return m.apply(v, *args)


@pytest.fixture(scope="module")
def x32():
    return jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))


def test_backbone_strides_and_channels(x32):
    m = DeepBaseResNet101Dilated8()
    v = m.init(jax.random.PRNGKey(0), x32)
    x1, x2, x3, x4 = m.apply(v, x32)
    assert x1.shape == (1, 8, 8, 256)    # /4
    assert x2.shape == (1, 4, 4, 512)    # /8
    assert x3.shape == (1, 4, 4, 1024)   # /8 dilated
    assert x4.shape == (1, 4, 4, 2048)   # /8 dilated


@pytest.mark.parametrize("cls", [SpatialOCRNet, ASPOCRNet, FcnNet, BaseOCNet, AspOCNet])
def test_dsn_nets_shapes(cls, x32):
    aux, out = _init_apply(cls(num_classes=1), x32)
    assert aux.shape == (1, 32, 32, 1)
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_isanet_shapes(x32):
    aux, out = _init_apply(ISANet(num_classes=1, down_factors=((2, 2),)), x32)
    assert out.shape == (1, 32, 32, 1) and np.isfinite(np.asarray(out)).all()


def test_ce2p_ocrnet_outputs(x32):
    seg1, edge, dsn, seg2 = _init_apply(CE2POCRNet(num_classes=1), x32)
    assert seg1.shape == (1, 32, 32, 1)
    assert edge.shape == (1, 32, 32, 2)
    assert dsn.shape == (1, 32, 32, 1)
    assert seg2.shape == (1, 32, 32, 1)


def test_ideal_ocrnet_variants(x32):
    from csbsr_tpu.models.openseg import (
        IdealDistributeOCRNet,
        IdealGatherOCRNet,
        IdealSpatialOCRNetB,
        IdealSpatialOCRNetC,
    )

    label = jnp.asarray((np.random.RandomState(1).rand(1, 32, 32) > 0.7).astype(np.int32))
    for cls in (IdealSpatialOCRNet, IdealSpatialOCRNetB, IdealSpatialOCRNetC,
                IdealGatherOCRNet, IdealDistributeOCRNet):
        m = cls(num_classes=2)
        v = m.init({"params": jax.random.PRNGKey(0)}, x32, label)
        aux, out = m.apply(v, x32, label)
        assert out.shape == (1, 32, 32, 2) and np.isfinite(np.asarray(out)).all(), cls


def test_segfix_hrnet_heads(x32):
    mask, direc = _init_apply(SegFixHRNet(num_directions=8), x32)
    assert mask.shape[-1] == 2 and direc.shape[-1] == 8
    assert mask.shape[1:3] == direc.shape[1:3]


def test_offset_sample_identity_and_shift(rng):
    x = jnp.asarray(rng.rand(1, 6, 8, 3).astype(np.float32))
    zero = jnp.zeros((1, 6, 8, 2))
    np.testing.assert_allclose(np.asarray(offset_sample(x, zero)), np.asarray(x), atol=1e-6)
    # integer shift by +1 in x: interior matches a shifted view, border clamps
    off = jnp.zeros((1, 6, 8, 2)).at[..., 1].set(1.0)
    out = np.asarray(offset_sample(x, off))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(x)[:, :, 1:], atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], np.asarray(x)[:, :, -1], atol=1e-6)
