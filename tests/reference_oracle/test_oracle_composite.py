"""End-to-end composite training-objective oracle (VERDICT r3 #8).

The REAL reference pieces — `JointModelWithLoss.calc_sr_loss/calc_ss_loss/
multiple_weight` (`build_model.py:160-187,231-278,422-438`) and the trainer's
`calc_loss`/`calc_pretrain_loss`/`increase_w_task` arithmetic
(`trainer.py:407-438,455-464`) — are run verbatim on synthetic predictions,
and the scalar total must match our `build_loss_fn` on identical inputs and
phase.  This pins the β/w_task combiner, the pretrain-window overrides, the
aux-loss combination, and the per-pixel failure-oriented seg weighting to
the reference's arithmetic rather than to our reading of it.

Model forwards are pinned separately by the per-family oracle tests; here
the nets are constructed (the loss fns hang off the model object) but never
run, so the whole file stays quick-tier cheap.
"""
import types

import numpy as np
import pytest

from . import shims, util

shims.install()
shims.patch_extractors_no_imagenet()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.engine.losses_glue import build_loss_fn  # noqa: E402
from csbsr_tpu.engine.phase import compute_phase, phase_config_from_cfg  # noqa: E402

pytestmark = pytest.mark.quick

_ARGS = types.SimpleNamespace(wandb_flag=False)

# shared yacs overrides (both config trees carry identical key paths)
_SHARED = [
    "MODEL.SR", "KBPN", "MODEL.NUM_STAGES", 2, "MODEL.SR_SCRATCH", True,
    "MODEL.DETECTOR_TYPE", "PSPNet", "MODEL.SCALE_FACTOR", 4,
    "MODEL.NUM_CLASSES", 1, "MODEL.JOINT_LEARNING", True,
    "BLUR.KERNEL_SIZE", 7, "BLUR.KERNEL_SIZE_OUTPUT", 7,
    "SOLVER.SR_LOSS_FUNC", "KBPN", "SOLVER.SEG_LOSS_FUNC", "BoundaryCombo",
    "SOLVER.TASK_LOSS_WEIGHT", 0.6, "SOLVER.BATCH_SIZE", 2,
    "SOLVER.SR_PRETRAIN_ITER", (1, 50), "SOLVER.SEG_PRETRAIN_ITER", (50, 80),
]

_B, _K, _SF, _HLR = 2, 7, 4, 8


@pytest.fixture(scope="module")
def ref_model():
    """JointModelWithLoss with KBPN(2 stages)+PSPNet; forwards never run."""
    from model.modeling.build_model import JointModelWithLoss
    from model.data.transforms.transforms import FactorResize

    rcfg = util.ref_cfg(_SHARED)
    m = JointModelWithLoss(rcfg, num_train_ds=100, resume_iter=0,
                           sr_transforms=FactorResize(_SF, "bicubic"))
    m.eval()
    # freeze the BoundaryCombo internal epoch counter so each oracle call is
    # independent; alpha is injected explicitly per test
    m.iter_cnt = False
    return m, rcfg


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(33)
    h = _HLR * _SF
    d = {
        "x": rs.rand(_B, 3, _HLR, _HLR),
        "sr_preds": rs.rand(_B, 3, h, h),
        "sr_targets": rs.rand(_B, 3, h, h),
        "kvec": rs.rand(_B, _K * _K) + 0.1,
        "gt_kernel": rs.rand(_B, _K * _K),
        "seg_preds": rs.rand(_B, 1, h, h) * 0.98 + 0.01,
        "aux_preds": rs.rand(_B, 1, h, h) * 0.98 + 0.01,
        "seg_targets": (rs.rand(_B, 1, h, h) > 0.7).astype(np.float64),
    }
    d["gt_kernel"] /= d["gt_kernel"].sum(axis=1, keepdims=True)
    return {k: v.astype(np.float64) for k, v in d.items()}


def _ref_total(m, cfg, data, it, alpha, with_aux=True):
    """Reference composite verbatim: calc_sr_loss -> calc_ss_loss ->
    multiple_weight -> trainer.calc_loss."""
    from model.engine.trainer import calc_loss

    m.ss_loss_fn.alpha = alpha
    t = {k: torch.from_numpy(v) for k, v in data.items()}
    kmap = t["kvec"][:, :, None, None].expand(_B, _K * _K, _HLR, _HLR)
    gt = t["gt_kernel"].reshape(_B, 1, _K, _K)
    with torch.no_grad():
        sr_loss, _ = m.calc_sr_loss(
            t["x"], t["sr_preds"], t["sr_targets"], it, kmap, gt,
            t["seg_preds"], t["seg_targets"])
        seg_loss = m.calc_ss_loss(
            t["seg_preds"], t["seg_targets"],
            t["aux_preds"] if with_aux else None)
        sr_loss, seg_loss = m.multiple_weight(
            sr_loss, seg_loss, t["seg_preds"], t["seg_targets"], it)
        total, _, _ = calc_loss(seg_loss, 0.0, sr_loss, 0.0, it, cfg, _ARGS)
    return float(total)


def _our_total(cfg, data, it, alpha, with_aux=True):
    loss_fn = build_loss_fn(cfg)
    pc = phase_config_from_cfg(cfg, 100)
    outputs = {
        "sr": util.nhwc(data["sr_preds"]),
        "kernel": jnp.asarray(data["kvec"]),
        "seg": util.nhwc(data["seg_preds"]),
        "aux": util.nhwc(data["aux_preds"]) if with_aux else None,
    }
    batch = {
        "lr": util.nhwc(data["x"]),
        "hr": util.nhwc(data["sr_targets"]),
        "seg": util.nhwc(data["seg_targets"]),
        "kernel": jnp.asarray(data["gt_kernel"]).reshape(_B, _K, _K),
    }
    with util.x64():
        phase = compute_phase(it, pc)
        phase["alpha"] = jnp.asarray(alpha, jnp.float64)
        out = loss_fn(outputs, batch, phase)
        return float(out["total"])


# tolerance: the reference BoundaryLoss casts its SDF term to f32 internally
# (`boundary_loss.py:55-57`) even under .double(), so any alpha < 1 carries
# ~6e-8 of f32 rounding; translator/arithmetic divergence shows at >= 1e-4.
_TOL = 1e-7


@pytest.mark.parametrize("it,descr", [
    (10, "sr-pretrain window: total == sr_loss.mean()"),
    (60, "seg-pretrain window: total == segment_loss.mean()"),
    (100, "joint phase: (1-beta)*sr + beta*seg, beta=0.6"),
])
def test_composite_total_matches_reference(ref_model, data, it, descr):
    m, rcfg = ref_model
    cfg = util.our_cfg(_SHARED)
    alpha = 0.55  # exercises the boundary term of BoundaryCombo
    ref = _ref_total(m, rcfg, data, it, alpha)
    ours = _our_total(cfg, data, it, alpha)
    assert abs(ref - ours) < _TOL, f"{descr}: ref={ref} ours={ours}"


def test_composite_no_aux_matches_reference(ref_model, data):
    """aux=None path (`calc_ss_loss` else-branch, `build_model.py:275-277`)."""
    m, rcfg = ref_model
    cfg = util.our_cfg(_SHARED)
    ref = _ref_total(m, rcfg, data, 100, 1.0, with_aux=False)
    ours = _our_total(cfg, data, 100, 1.0, with_aux=False)
    assert abs(ref - ours) < _TOL


@pytest.mark.parametrize("it,expected_w", [(200, 0.5), (1000, 1.0)])
def test_composite_task_weight_ramp(ref_model, data, it, expected_w):
    """TASK_LOSS_WEIGHT=-1 linear ramp (`increase_w_task`,
    `trainer.py:455-464`) incl. the w_task>1 clamp."""
    m, _ = ref_model
    variant = _SHARED + ["SOLVER.TASK_LOSS_WEIGHT", -1.0,
                         "SOLVER.INCRESE_TASK_W_ITER", (100, 300)]
    rcfg_v = util.ref_cfg(variant)
    cfg_v = util.our_cfg(variant)
    ref = _ref_total(m, rcfg_v, data, it, 1.0)
    ours = _our_total(cfg_v, data, it, 1.0)
    assert abs(ref - ours) < _TOL, f"w_task ramp at it={it} (w={expected_w})"


@pytest.mark.parametrize("sr_seg_inv", [False, True])
def test_composite_non_joint(ref_model, data, sr_seg_inv):
    """JOINT_LEARNING=False: loss is seg (or sr when SR_SEG_INV)
    (`trainer.py:424-430`); same calc arithmetic, different cfg."""
    m, _ = ref_model
    variant = _SHARED + ["MODEL.JOINT_LEARNING", False,
                         "MODEL.SR_SEG_INV", sr_seg_inv]
    rcfg_v = util.ref_cfg(variant)
    cfg_v = util.our_cfg(variant)
    ref = _ref_total(m, rcfg_v, data, 200, 1.0)
    ours = _our_total(cfg_v, data, 200, 1.0)
    assert abs(ref - ours) < _TOL


# --------------------------------------------------------------- SF=1 path
_SHARED_SF1 = [
    "MODEL.SR", "KBPN", "MODEL.SR_SCRATCH", True, "MODEL.SCALE_FACTOR", 1,
    "MODEL.DETECTOR_TYPE", "SegNet", "MODEL.NUM_CLASSES", 1,
    "MODEL.JOINT_LEARNING", True, "BLUR.KERNEL_SIZE", 7,
    "BLUR.KERNEL_SIZE_OUTPUT", 7, "SOLVER.SR_LOSS_FUNC", "KBPN",
    "SOLVER.SEG_LOSS_FUNC", "BoundaryCombo", "SOLVER.BATCH_SIZE", 2,
    "SOLVER.SR_PRETRAIN_ITER", (1, 50), "SOLVER.SEG_PRETRAIN_ITER", (50, 80),
    "SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SS_AMP", 0.5,
    # it=100 lands past the gate (weighted), it=10 before it (plain mean):
    # pins `if self.oriented_w_iter <= iter` (`build_model.py:423`)
    "SOLVER.ORIENTED_WEIGHT_ITER", 50,
]


@pytest.fixture(scope="module")
def ref_model_sf1():
    """SCALE_FACTOR=1 (sr_model=None) + SegNet + per-pixel seg weighting:
    out_map=True BoundaryCombo, w_sfo_ss multiplication in multiple_weight."""
    from model.modeling.build_model import JointModelWithLoss
    from model.data.transforms.transforms import FactorResize

    rcfg = util.ref_cfg(_SHARED_SF1)
    m = JointModelWithLoss(rcfg, num_train_ds=100, resume_iter=0,
                           sr_transforms=FactorResize(1, "bicubic"))
    m.eval()
    m.iter_cnt = False
    return m, rcfg


@pytest.mark.parametrize("it", [100, 10])
def test_composite_sf1_sfo_ss_weight(ref_model_sf1, data, it):
    """SF=1: reference returns segment_loss with NO calc_pretrain_loss
    (`trainer.py:416-417`) — it=10 sits inside the SR window and must NOT
    flip to sr_loss.  The seg loss goes through the per-pixel out_map ->
    w_sfo_ss -> mean pipeline (`multiple_weight`, `build_model.py:433-434`)."""
    from model.engine.trainer import calc_loss

    m, rcfg = ref_model_sf1
    alpha = 0.55
    m.ss_loss_fn.alpha = alpha
    t = {k: torch.from_numpy(v) for k, v in data.items()}
    with torch.no_grad():
        seg_loss = m.calc_ss_loss(t["seg_preds"], t["seg_targets"], None)
        # sr_model is None -> calc_sr_loss returns (None, kernel_preds)
        sr_loss, _ = m.calc_sr_loss(t["x"], None, t["sr_targets"], it)
        assert sr_loss is None
        _, seg_loss = m.multiple_weight(sr_loss, seg_loss, t["seg_preds"],
                                        t["seg_targets"], it)
        ref, _, _ = calc_loss(seg_loss, 0.0, sr_loss, 0.0, it, rcfg, _ARGS)
        ref = float(ref)

    cfg = util.our_cfg(_SHARED_SF1)
    loss_fn = build_loss_fn(cfg)
    pc = phase_config_from_cfg(cfg, 100)
    outputs = {"seg": util.nhwc(data["seg_preds"]), "aux": None}
    batch = {"lr": util.nhwc(data["x"]), "hr": util.nhwc(data["sr_targets"]),
             "seg": util.nhwc(data["seg_targets"]),
             "kernel": jnp.asarray(data["gt_kernel"]).reshape(_B, _K, _K)}
    with util.x64():
        phase = compute_phase(it, pc)
        phase["alpha"] = jnp.asarray(alpha, jnp.float64)
        ours = float(loss_fn(outputs, batch, phase)["total"])
    assert abs(ref - ours) < _TOL, f"SF=1 sfo_ss at it={it}: ref={ref} ours={ours}"
