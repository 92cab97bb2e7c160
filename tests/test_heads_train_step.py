"""One sharded train step per segmentation head / model family.

Covers the loss-glue and grad paths the flagship test doesn't: PSPNet aux,
CrackFormer sides-aux (x5 weighting), SegNet (no aux), HRNet-OCR aux,
DSRL parallel path with FA loss, DBPN+L1, SR-only pretrain mode.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train_step import tiny_cfg, make_batch, _setup


def _one_step(cfg, rng, hw=32):
    batch = make_batch(rng, b=8, hw=hw)
    model, pc, state, step = _setup(cfg, batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"])), metrics
    return metrics


def test_pspnet_head_step(rng):
    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "PSPNet"})
    _one_step(cfg, rng)


def test_segnet_head_step(rng):
    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "SegNet", "SOLVER.SEG_LOSS_FUNC": "Dice"})
    _one_step(cfg, rng)


def test_crackformer_head_step(rng):
    cfg = tiny_cfg(**{
        "MODEL.DETECTOR_TYPE": "CrackFormer",
        "SOLVER.SEG_LOSS_FUNC": "BoundaryCombo",
    })
    _one_step(cfg, rng)


def test_hrnet_head_step(rng):
    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "HRNet_OCR"})
    _one_step(cfg, rng)


def test_dbpn_l1_step(rng):
    cfg = tiny_cfg(**{
        "MODEL.SR": "DBPN",
        "SOLVER.SR_LOSS_FUNC": "L1",
    })
    _one_step(cfg, rng)


def test_bicubic_sr_step(rng):
    cfg = tiny_cfg(**{"MODEL.SR": "bicubic", "SOLVER.SR_LOSS_FUNC": "L1"})
    _one_step(cfg, rng)


def test_dsrl_step(rng):
    cfg = tiny_cfg(**{
        "MODEL.SR": "DSRL",
        "MODEL.DETECTOR_TYPE": "DSRL",
        "SOLVER.SR_LOSS_FUNC": "L1",
        "INPUT.IMAGE_SIZE": [64, 64],
    })
    batch = make_batch(rng, b=8, hw=64)
    model, pc, state, step = _setup(cfg, batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sr_only_pretrain_step(rng):
    cfg = tiny_cfg(**{"DATASET.ONLY_IMAGES": True})
    m = _one_step(cfg, rng)
    assert float(m["seg_loss"]) == 0.0


def test_blurskip_step_trains_only_blurskip(rng):
    cfg = tiny_cfg(**{"MODEL.DETECTOR_TYPE": "PSPNet_BlurSkip"})
    batch = make_batch(rng)
    model, pc, state, step = _setup(cfg, batch)
    before_sr = jax.device_get(
        state.params["sr_model"]["stage1_up"]["conv"]["conv"]["kernel"]
    )
    before_skip = jax.tree_util.tree_leaves(
        {k: v for k, v in state.params["segmentation_model"].items() if "blur_skip" in k}
    )
    # jump past all pretrain windows so the masks alone drive the freeze
    state = state.replace(step=jnp.asarray(100, jnp.int32))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after_sr = jax.device_get(
        state.params["sr_model"]["stage1_up"]["conv"]["conv"]["kernel"]
    )
    after_skip = jax.tree_util.tree_leaves(
        {k: v for k, v in state.params["segmentation_model"].items() if "blur_skip" in k}
    )
    np.testing.assert_array_equal(before_sr, after_sr)
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(before_skip, after_skip)
    )
    assert changed
