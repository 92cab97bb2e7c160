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


@pytest.mark.quick
def test_offset_sample_identity_and_shift(rng):
    x = jnp.asarray(rng.rand(1, 6, 8, 3).astype(np.float32))
    zero = jnp.zeros((1, 6, 8, 2))
    np.testing.assert_allclose(np.asarray(offset_sample(x, zero)), np.asarray(x), atol=1e-6)
    # integer shift by +1 in x: interior matches a shifted view, border clamps
    off = jnp.zeros((1, 6, 8, 2)).at[..., 1].set(1.0)
    out = np.asarray(offset_sample(x, off))
    np.testing.assert_allclose(out[:, :, :-1], np.asarray(x)[:, :, 1:], atol=1e-6)
    np.testing.assert_allclose(out[:, :, -1], np.asarray(x)[:, :, -1], atol=1e-6)


@pytest.mark.quick
def test_model_manager_registry():
    """model_manager.py:44-88 parity: every name constructs the right class."""
    from csbsr_tpu.models.openseg import SEG_MODEL_DICT, semantic_segmentor
    from csbsr_tpu.models.hrnet_ocr import HRNetW48OCR

    for name, cls in SEG_MODEL_DICT.items():
        m = semantic_segmentor(name, num_classes=3)
        assert isinstance(m, cls), name
    assert isinstance(semantic_segmentor("hrnet_w48_ocr", num_classes=1), HRNetW48OCR)
    with pytest.raises(KeyError):
        semantic_segmentor("not_a_net")


@pytest.mark.quick
def test_direction_offsets_eight():
    from csbsr_tpu.models.openseg import direction_offsets

    offs = np.asarray(direction_offsets(8))
    expected = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]
    np.testing.assert_array_equal(offs, np.asarray(expected, np.float32))


def test_segfix_refine_moves_boundary_labels():
    """The offset refinement relabels boundary pixels from their
    direction-step neighbour (openseg scripts/segfix.py procedure)."""
    from csbsr_tpu.models.openseg import segfix_refine

    h = w = 8
    # label map: left half class 0, right half class 1, with a one-pixel
    # mislabelled boundary column at x=4 (class 0 leaking right)
    label = np.zeros((1, h, w), np.int32)
    label[:, :, 5:] = 1
    label[:, :, 4] = 0  # boundary column, ambiguous
    # boundary mask: flags column 4
    mask_logits = np.zeros((1, h, w, 2), np.float32)
    mask_logits[..., 4, 1] = 10.0  # boundary prob ~1 at x=4
    # direction head: points right (+x) everywhere => boundary pixels take
    # the label of their right neighbour (class 1)
    dir_logits = np.zeros((1, h, w, 8), np.float32)
    dir_logits[..., 0] = 10.0  # direction 0 = (dy, dx) = (0, 1)
    out = np.asarray(segfix_refine(
        jnp.asarray(label), jnp.asarray(mask_logits), jnp.asarray(dir_logits)))
    assert (out[:, :, 4] == 1).all()          # boundary relabelled
    np.testing.assert_array_equal(out[:, :, :4], label[:, :, :4])  # interior kept
    np.testing.assert_array_equal(out[:, :, 5:], label[:, :, 5:])

    # pointing left instead keeps class 0 at the boundary
    dir_logits[..., 0] = 0.0
    dir_logits[..., 4] = 10.0  # direction 4 = (0, -1)
    out = np.asarray(segfix_refine(
        jnp.asarray(label), jnp.asarray(mask_logits), jnp.asarray(dir_logits)))
    assert (out[:, :, 4] == 0).all()

    # two iterations propagate one step further through a 2-px boundary band
    mask_logits[..., 3, 1] = 10.0
    dir_logits[..., 4] = 0.0
    dir_logits[..., 0] = 10.0
    out = np.asarray(segfix_refine(
        jnp.asarray(label), jnp.asarray(mask_logits), jnp.asarray(dir_logits),
        iterations=2))
    assert (out[:, :, 3] == 1).all() and (out[:, :, 4] == 1).all()
