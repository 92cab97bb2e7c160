"""Loss-level oracles against the REAL reference loss modules
(`model/utils/loss_functions.py`, `boundary_loss.py`, `sr_loss_functions.py`,
`oriented_weight.py`) — VERDICT r3 Next-round #1 (loss half) and #8.

skimage.find_boundaries / scipy EDT run through the shims; torch code is
unmodified reference source.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _rand_pred_target(rs, b=2, h=24, w=24):
    pred = rs.rand(b, 1, h, w).astype(np.float64)
    target = (rs.rand(b, 1, h, w) > 0.7).astype(np.float64)
    # make one sample near-empty to exercise the SDF empty-mask branch
    target[1] = 0.0
    target[1, 0, h // 2, w // 2] = 1.0
    return pred, target


@pytest.mark.quick
@pytest.mark.parametrize("alpha", [1.0, 0.55, 0.01])
def test_boundary_combo_loss_matches_reference(alpha):
    from model.utils.loss_functions import BoundaryComboLoss as RefLoss
    from csbsr_tpu.losses.seg_losses import boundary_combo_loss

    rs = np.random.RandomState(17)
    pred, target = _rand_pred_target(rs)

    ref = RefLoss(per_epoch=100, reduction="none", pos_weight=[1, 1],
                  loss_weight=[1, 1])
    ref.alpha = alpha
    with torch.no_grad():
        ref_loss = ref(torch.from_numpy(pred), torch.from_numpy(target)).numpy()

    with util.x64():
        ours = boundary_combo_loss(
            jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(target, (0, 2, 3, 1))),
            alpha,
        )
    diff = float(np.max(np.abs(ref_loss - np.asarray(ours))))
    # The reference's BoundaryLoss internally casts the SDF and predictions
    # to float32 even under .double() (`boundary_loss.py:55-57` — `.float()`
    # / `.type(torch.float32)`), so the boundary term carries ~6e-8 f32
    # rounding whenever alpha < 1; our f64 path is exact. 5e-8 bounds the
    # mean of those rounding errors while still failing on any real
    # translator/architecture divergence (those show at >=1e-4).
    tol = 1e-9 if alpha == 1.0 else 5e-8
    assert diff < tol, f"BoundaryCombo(alpha={alpha}) mismatch: {diff}"


@pytest.mark.quick
def test_weighted_pos_boundary_combo_matches_reference():
    """Non-trivial pos/loss weights (`loss_functions.py:202,341`)."""
    from model.utils.loss_functions import BoundaryComboLoss as RefLoss
    from csbsr_tpu.losses.seg_losses import boundary_combo_loss

    rs = np.random.RandomState(18)
    pred, target = _rand_pred_target(rs)
    ref = RefLoss(per_epoch=100, reduction="none", pos_weight=[3, 1],
                  loss_weight=[2, 1])
    ref.alpha = 0.7
    with torch.no_grad():
        ref_loss = ref(torch.from_numpy(pred), torch.from_numpy(target)).numpy()
    with util.x64():
        ours = boundary_combo_loss(
            jnp.asarray(np.transpose(pred, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(target, (0, 2, 3, 1))),
            0.7, pos_weight=(3, 1), loss_weight=(2, 1),
        )
    diff = float(np.max(np.abs(ref_loss - np.asarray(ours))))
    # 5e-8: the reference boundary term is f32 internally (see
    # test_boundary_combo_loss_matches_reference).
    assert diff < 5e-8, f"weighted BoundaryCombo mismatch: {diff}"


def _ref_kbpn_loss(ref_cfg, iteration, hr_pred, hr_t, lr_t, kvec, gt_kernel,
                   seg_pred=None, seg_t=None):
    from model.utils.sr_loss_functions import KBPNLoss as RefKBPNLoss
    from model.data.transforms.transforms import FactorResize

    sr_transforms = FactorResize(ref_cfg.MODEL.SCALE_FACTOR, "bicubic")
    ref = RefKBPNLoss(ref_cfg, sr_transforms)
    k = ref_cfg.BLUR.KERNEL_SIZE_OUTPUT
    b, h_lr = hr_pred.shape[0], lr_t.shape[2]
    # reference carries the kernel as an expanded constant map and GAPs it
    kmap = torch.from_numpy(kvec)[:, :, None, None].expand(b, k * k, h_lr, h_lr)
    gt = torch.from_numpy(gt_kernel).reshape(b, 1, k, k)
    args = [torch.from_numpy(hr_pred), torch.from_numpy(hr_t),
            torch.from_numpy(lr_t), kmap, gt]
    args += [None if seg_pred is None else torch.from_numpy(seg_pred),
             None if seg_t is None else torch.from_numpy(seg_t), iteration]
    with torch.no_grad():
        loss, kernel_pred = ref(*args)
    return loss.numpy(), kernel_pred.numpy()


@pytest.mark.quick
def test_kbpn_loss_matches_reference():
    """Base path: w0*L1(HR) + w1*L1(pseudo-LR) + w2*MSE(kernel)
    (`sr_loss_functions.py:39-56`), joint phase, no oriented weights."""
    from csbsr_tpu.losses.sr_losses import kbpn_loss

    k, sf = 7, 4
    ref_cfg = util.ref_cfg(["BLUR.KERNEL_SIZE", k, "BLUR.KERNEL_SIZE_OUTPUT", k])
    rs = np.random.RandomState(19)
    hr_pred = rs.rand(2, 3, 32, 32).astype(np.float64)
    hr_t = rs.rand(2, 3, 32, 32).astype(np.float64)
    lr_t = rs.rand(2, 3, 8, 8).astype(np.float64)
    kvec = rs.rand(2, k * k).astype(np.float64)
    gt_kernel = rs.rand(2, k * k).astype(np.float64)
    gt_kernel /= gt_kernel.sum(axis=1, keepdims=True)
    it = 10**9

    ref_loss, _ = _ref_kbpn_loss(ref_cfg, it, hr_pred, hr_t, lr_t, kvec, gt_kernel)

    with util.x64():
        ours, _ = kbpn_loss(
            util.nhwc(hr_pred), util.nhwc(hr_t), util.nhwc(lr_t),
            jnp.asarray(kvec), jnp.asarray(gt_kernel).reshape(2, k, k), it,
            ksize=k, scale_factor=sf,
            weights=tuple(ref_cfg.SOLVER.SR_LOSS_FUNC_SR_WEIGHT),
        )
    diff = float(np.max(np.abs(ref_loss - np.asarray(ours))))
    assert diff < 1e-9, f"KBPNLoss mismatch: {diff}"


@pytest.mark.quick
def test_kbpn_loss_kernel_window_matches_reference():
    """ONLY_KERNEL_LOSS inside the kernel-pretrain window
    (`sr_loss_functions.py:50-52`): reference returns the raw MSE map; both
    sides agree after the trainer's mean reduction."""
    from csbsr_tpu.losses.sr_losses import kbpn_loss

    k, sf = 7, 4
    ref_cfg = util.ref_cfg([
        "BLUR.KERNEL_SIZE", k, "BLUR.KERNEL_SIZE_OUTPUT", k,
        "SOLVER.ONLY_KERNEL_LOSS_FOR_PRETRAIN", True,
        "SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER", (10, 100),
    ])
    rs = np.random.RandomState(20)
    hr_pred = rs.rand(1, 3, 16, 16).astype(np.float64)
    hr_t = rs.rand(1, 3, 16, 16).astype(np.float64)
    lr_t = rs.rand(1, 3, 4, 4).astype(np.float64)
    kvec = rs.rand(1, k * k).astype(np.float64)
    gt_kernel = rs.rand(1, k * k).astype(np.float64)
    gt_kernel /= gt_kernel.sum(axis=1, keepdims=True)
    it = 50  # inside the window

    ref_loss, _ = _ref_kbpn_loss(ref_cfg, it, hr_pred, hr_t, lr_t, kvec, gt_kernel)

    with util.x64():
        ours, _ = kbpn_loss(
            util.nhwc(hr_pred), util.nhwc(hr_t), util.nhwc(lr_t),
            jnp.asarray(kvec), jnp.asarray(gt_kernel).reshape(1, k, k), it,
            ksize=k, scale_factor=sf,
            weights=tuple(ref_cfg.SOLVER.SR_LOSS_FUNC_SR_WEIGHT),
            only_kernel_loss_in_window=True,
        )
    diff = abs(float(ref_loss.mean()) - float(np.asarray(ours).mean()))
    assert diff < 1e-12, f"KBPNLoss kernel-window mismatch: {diff}"


@pytest.mark.quick
def test_kbpn_loss_oriented_weights_match_reference():
    """w^f path (`sr_loss_functions.py:47-48,58-71`): crack-oriented and
    seg-failure-oriented exp weights multiply the HR/LR maps past
    ORIENTED_WEIGHT_ITER."""
    from csbsr_tpu.losses.sr_losses import kbpn_loss

    k, sf = 7, 4
    ref_cfg = util.ref_cfg([
        "BLUR.KERNEL_SIZE", k, "BLUR.KERNEL_SIZE_OUTPUT", k,
        "SOLVER.ORIENTED_WEIGHT_ITER", 100,
        "SOLVER.CRACK_ORIENTED_WEIGHT4SR_AMP", 1.0,
        "SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SR_AMP", 0.5,
    ])
    rs = np.random.RandomState(21)
    hr_pred = rs.rand(2, 3, 32, 32).astype(np.float64)
    hr_t = rs.rand(2, 3, 32, 32).astype(np.float64)
    lr_t = rs.rand(2, 3, 8, 8).astype(np.float64)
    kvec = rs.rand(2, k * k).astype(np.float64)
    gt_kernel = rs.rand(2, k * k).astype(np.float64)
    gt_kernel /= gt_kernel.sum(axis=1, keepdims=True)
    seg_pred = rs.rand(2, 1, 32, 32).astype(np.float64)
    seg_t = (rs.rand(2, 1, 32, 32) > 0.7).astype(np.float64)
    it = 200  # past weight_iter

    ref_loss, _ = _ref_kbpn_loss(ref_cfg, it, hr_pred, hr_t, lr_t, kvec,
                                 gt_kernel, seg_pred, seg_t)

    with util.x64():
        ours, _ = kbpn_loss(
            util.nhwc(hr_pred), util.nhwc(hr_t), util.nhwc(lr_t),
            jnp.asarray(kvec), jnp.asarray(gt_kernel).reshape(2, k, k), it,
            ksize=k, scale_factor=sf,
            weights=tuple(ref_cfg.SOLVER.SR_LOSS_FUNC_SR_WEIGHT),
            segment_preds=util.nhwc(seg_pred),
            segment_targets=util.nhwc(seg_t),
            co_amp=1.0, sfo_amp=0.5, weight_iter=100,
        )
    diff = float(np.max(np.abs(ref_loss - np.asarray(ours))))
    assert diff < 1e-9, f"KBPNLoss w^f mismatch: {diff}"


@pytest.mark.quick
def test_fa_loss_matches_reference():
    """DSRL feature-affinity loss vs the real `FALoss`
    (`DSRL/utils/fa_loss.py:5-30`), B=2 to pin the batch-summed
    `torch.norm(mat2-mat1, 1)` quirk the file itself flags."""
    from model.modeling.DSRL.utils.fa_loss import FALoss
    from csbsr_tpu.losses.fa_loss import fa_loss

    rs = np.random.RandomState(23)
    f1 = rs.rand(2, 5, 32, 32).astype(np.float64)
    f2 = rs.rand(2, 5, 32, 32).astype(np.float64)
    with torch.no_grad():
        ref = float(FALoss()(torch.from_numpy(f1), torch.from_numpy(f2)))
    with util.x64():
        ours = float(fa_loss(util.nhwc(f1), util.nhwc(f2)))
    assert abs(ref - ours) < 1e-9, f"FALoss mismatch: {ref} vs {ours}"
