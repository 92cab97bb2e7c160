"""Loss composition: model outputs + batch + phase -> scalar loss dict.

Rebuild of the loss wiring in `build_model.py:149-317,370-438` and
`trainer.py:406-464` as pure functions.  Static choices (which loss, which
weights) come from the config at closure-build time; dynamic phase scalars
(alpha, beta, pretrain windows) are traced inputs.
"""
from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.resize import resize as _resize
from ..losses import (
    bce,
    bce_dice,
    binary_dice,
    boundary_combo_loss,
    boundary_gdice_loss,
    generalized_boundary_combo_loss,
    weighted_bce,
    cross_entropy_loss_rcf,
    l1_per_sample,
    l2_per_sample,
    kbpn_loss,
    segment_failure_oriented_exp_weight,
    segment_failure_oriented_weight,
    crack_oriented_exp_weight,
    crack_oriented_weight,
    fa_loss as fa_loss_fn,
)


def build_seg_loss(cfg) -> Callable:
    """set_ss_loss (`build_model.py:280-317`) -> fn(pred, target, alpha) -> (B,)."""
    name = cfg.SOLVER.SEG_LOSS_FUNC
    pos_w = tuple(cfg.SOLVER.BCELOSS_WEIGHT)
    loss_w = tuple(cfg.SOLVER.WB_AND_D_WEIGHT)
    sfo_ss_amp = float(cfg.SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SS_AMP)
    per_pixel = sfo_ss_amp != 0.0 or bool(cfg.SOLVER.INTERM_SSLOSSWEGHT4SR)

    if name == "BCE":
        base = lambda p, t, a: bce(p, t)
    elif name == "WeightedBCE":
        base = lambda p, t, a: weighted_bce(p, t, pos_w)
    elif name == "Dice":
        base = lambda p, t, a: binary_dice(p, t)
    elif name == "Combo":
        base = lambda p, t, a: bce_dice(p, t, pos_w, loss_w)
    elif name == "BoundaryCombo":
        base = lambda p, t, a: boundary_combo_loss(p, t, a, pos_w, loss_w, per_pixel=per_pixel)
    elif name == "Boundary_GDice":
        base = lambda p, t, a: boundary_gdice_loss(p, t, a)
    elif name == "GeneralizedBoundaryCombo":
        base = lambda p, t, a: generalized_boundary_combo_loss(p, t, a, pos_w, loss_w)
    elif name == "CrackFormerLoss":
        base = lambda p, t, a: cross_entropy_loss_rcf(p, t)
    else:
        raise NotImplementedError(name)
    return base, per_pixel


def build_loss_fn(cfg) -> Callable:
    """Returns pure fn(outputs, batch, phase) -> dict of scalar losses.

    batch: {"lr": (B,h,w,3), "hr": (B,H,W,3), "seg": (B,H,W,1),
            "kernel": (B,k,k)}
    outputs: CSBSRModel outputs (sr, kernel vec, seg, aux).
    """
    seg_loss_fn, seg_per_pixel = build_seg_loss(cfg)
    aux_w = float(cfg.SOLVER.SEG_AUX_LOSS_WEIGHT)
    main_w = float(cfg.SOLVER.SEG_MAIN_LOSS_WEIGHT)
    sr_loss_name = cfg.SOLVER.SR_LOSS_FUNC
    kbpn_w = tuple(cfg.SOLVER.SR_LOSS_FUNC_SR_WEIGHT)
    ksize_out = int(cfg.BLUR.KERNEL_SIZE_OUTPUT)
    sf = int(cfg.MODEL.SCALE_FACTOR)
    only_kernel = bool(cfg.SOLVER.ONLY_KERNEL_LOSS_FOR_PRETRAIN)
    co_sr_amp = float(cfg.SOLVER.CRACK_ORIENTED_WEIGHT4SR_AMP)
    sfo_sr_amp = float(cfg.SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SR_AMP)
    sfo_ss_amp = float(cfg.SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SS_AMP)
    co_sr_bias = float(cfg.SOLVER.CRACK_ORIENTED_WEIGHT4SR_BIAS)
    sfo_sr_bias = float(cfg.SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SR_BIAS)
    sfo_ss_bias = float(cfg.SOLVER.SEG_FAIL_ORIENTED_WEIGHT4SS_BIAS)
    w_variant = str(cfg.TPU.ORIENTED_WEIGHT_VARIANT)
    w_gaus_sigma = float(cfg.SOLVER.ORIENTED_WEIGHT_GAUS)
    w_gaus_size = int(cfg.BLUR.KERNEL_SIZE)
    w_iter = int(cfg.SOLVER.ORIENTED_WEIGHT_ITER)

    def _co_weight(tgt):
        if w_variant == "linear":
            return crack_oriented_weight(tgt, co_sr_amp, co_sr_bias, w_gaus_size, w_gaus_sigma)
        return crack_oriented_exp_weight(tgt, co_sr_amp)

    def _sfo_weight(pred, tgt, amp, bias):
        if w_variant == "linear":
            return segment_failure_oriented_weight(pred, tgt, amp, bias, w_gaus_size, w_gaus_sigma)
        return segment_failure_oriented_exp_weight(pred, tgt, amp)
    interm_ss4sr = bool(cfg.SOLVER.INTERM_SSLOSSWEGHT4SR)
    joint = bool(cfg.MODEL.JOINT_LEARNING)
    sr_none = cfg.MODEL.SCALE_FACTOR == 1 or cfg.MODEL.SR == "bicubic"
    sr_seg_inv = bool(cfg.MODEL.SR_SEG_INV)
    downscale_method = cfg.SOLVER.DOWNSCALE_INTERPOLATION
    detector = cfg.MODEL.DETECTOR_TYPE
    is_dsrl = cfg.MODEL.SR == "DSRL"
    sr_only_mode = bool(cfg.DATASET.ONLY_IMAGES)
    dsrl_w = (float(cfg.SOLVER.DSRL_SR_WEIGHT), float(cfg.SOLVER.DSRL_FA_WEIGHT),
              float(cfg.SOLVER.DSRL_SEG_WEIGHT))

    def loss_fn(outputs, batch, phase) -> Dict[str, jnp.ndarray]:
        it = phase["iteration"]
        alpha = phase["alpha"]
        # compute dtype: f32 for the bf16/f32 training path, f64 when the
        # caller runs the loss stack in float64 (reference-oracle parity)
        _ref = outputs["sr"] if "sr" in outputs else outputs["seg"]
        acc = jnp.float64 if _ref.dtype == jnp.float64 else jnp.float32

        # SR-only pretraining (do_pretrain_sr, trainer.py:252-289)
        if sr_only_mode:
            sr_loss, kernel_2d = kbpn_loss(
                outputs["sr"].astype(acc),
                batch["hr"].astype(acc),
                batch["lr"].astype(acc),
                outputs["kernel"].astype(acc),
                batch["kernel"].astype(acc),
                it, ksize=ksize_out, scale_factor=sf, weights=kbpn_w,
                only_kernel_loss_in_window=(phase["in_kernel_window"] if only_kernel else None),
                downscale_method=downscale_method,
            ) if sr_loss_name == "KBPN" else (
                l1_per_sample(outputs["sr"].astype(acc), batch["hr"].astype(acc)),
                None,
            )
            sr_mean = jnp.mean(sr_loss)
            return {"total": sr_mean, "seg_loss": jnp.zeros(()), "sr_loss": sr_mean}

        seg_preds = outputs["seg"].astype(acc)
        seg_targets = batch["seg"].astype(acc)

        # ---- segmentation loss (calc_ss_loss, build_model.py:258-278)
        if sr_seg_inv and "lr_seg" in outputs:
            # JointInv (build_model.py:508-516): seg loss on the LR seg map
            # vs the downsampled target; the SR loss upgrades the seg map.
            lr_pred = outputs["lr_seg"].astype(acc)
            lr_tgt = _resize(seg_targets, lr_pred.shape[1:3], method=downscale_method)
            seg_loss = seg_loss_fn(lr_pred, lr_tgt, alpha)
        else:
            seg_loss = seg_loss_fn(seg_preds, seg_targets, alpha)
        if outputs.get("aux") is not None:
            aux = outputs["aux"].astype(acc)
            if sr_seg_inv:
                aux_tgt = _resize(seg_targets, aux.shape[1:3], method=downscale_method)
                aux_loss = seg_loss_fn(aux, aux_tgt, alpha)
            elif detector == "CrackFormer":
                # aux = stacked side maps; loss scaled by their count
                # (build_model.py:264-266)
                n_sides = aux.shape[-1]
                tgt = jnp.broadcast_to(seg_targets, aux.shape)
                aux_loss = seg_loss_fn(aux, tgt, alpha)
                aux_loss = jax.tree_util.tree_map(lambda v: v * n_sides, aux_loss)
            else:
                aux_loss = seg_loss_fn(aux, seg_targets, alpha)
            # per-pixel mode yields (paired, cross) tuples; combine leafwise
            seg_loss = jax.tree_util.tree_map(
                lambda m, a: main_w * m + aux_w * a, seg_loss, aux_loss)

        # ---- SR loss (calc_sr_loss, build_model.py:160-187)
        kernel_2d = None
        if sr_none:
            sr_loss = jnp.zeros((seg_preds.shape[0],), acc)
        elif sr_loss_name == "KBPN":
            only_kernel_flag = phase["in_kernel_window"] if only_kernel else None
            sr_loss, kernel_2d = kbpn_loss(
                outputs["sr"].astype(acc),
                batch["hr"].astype(acc),
                batch["lr"].astype(acc),
                outputs["kernel"].astype(acc),
                batch["kernel"].astype(acc),
                it,
                ksize=ksize_out, scale_factor=sf, weights=kbpn_w,
                only_kernel_loss_in_window=only_kernel_flag,
                segment_preds=seg_preds, segment_targets=seg_targets,
                co_amp=co_sr_amp, sfo_amp=sfo_sr_amp, weight_iter=w_iter,
                co_bias=co_sr_bias, sfo_bias=sfo_sr_bias,
                weight_variant=w_variant, gaus_size=w_gaus_size,
                gaus_sigma=w_gaus_sigma,
                downscale_method=downscale_method,
            )
        else:
            tgt = batch["seg" if sr_seg_inv else "hr"].astype(acc)
            fn = l1_per_sample if sr_loss_name == "L1" else l2_per_sample
            sr_loss = fn(outputs["sr"].astype(acc), tgt)
            # multiple_weight for non-KBPN (build_model.py:422-438); per-pixel
            # weights are folded before the per-sample reduction.
            if co_sr_amp != 0.0 or sfo_sr_amp != 0.0:
                per_map = jnp.abs(outputs["sr"].astype(acc) - tgt)
                if co_sr_amp != 0.0:
                    per_map = _co_weight(seg_targets) * per_map
                if sfo_sr_amp != 0.0:
                    per_map = _sfo_weight(seg_preds, seg_targets, sfo_sr_amp, sfo_sr_bias) * per_map
                sr_loss = jnp.where(it >= w_iter, jnp.mean(per_map, axis=(1, 2, 3)), sr_loss)

        # ---- failure-oriented seg weight (build_model.py:433-434), gated by
        # `oriented_w_iter <= iter` exactly as multiple_weight is.
        # The per-pixel map is the reference's (B,B,H,W) broadcast product
        # map[i,j] = paired[i] + cross[j] (see boundary_combo_loss); its
        # weighted mean  mean_{i,j,h,w} w[i]*(paired[i] + cross[j])  reduces
        # to the per-sample form below with cross replaced by its batch mean
        # — exact, without materialising B^2 maps on the hot path.
        if seg_per_pixel:
            paired, cross = seg_loss
            plain = jnp.mean(paired + cross, axis=(1, 2, 3))
            if sfo_ss_amp != 0.0:
                w = _sfo_weight(seg_preds, seg_targets, sfo_ss_amp, sfo_ss_bias)
                cross_bar = jnp.mean(cross, axis=0, keepdims=True)
                weighted = jnp.mean(w * (paired + cross_bar), axis=(1, 2, 3))
                seg_loss = jnp.where(it >= w_iter, weighted, plain)
            else:
                seg_loss = plain

        # ---- intermediate seg-loss weighting of SR (build_model.py:435-437)
        if interm_ss4sr:
            sr_loss = jnp.mean(jax.lax.stop_gradient(seg_loss)) * sr_loss

        seg_mean = jnp.mean(seg_loss)
        sr_mean = jnp.mean(sr_loss)

        # ---- DSRL combiner (trainer.py:440-452): w_sr*sr + w_fa*fa + w_seg*seg
        if is_dsrl:
            fa = fa_loss_fn(outputs["fea_seg"].astype(acc),
                            outputs["fea_sr"].astype(acc))
            total = dsrl_w[0] * sr_mean + dsrl_w[1] * fa + dsrl_w[2] * seg_mean
            total = jnp.where(phase["in_sr_pretrain"], sr_mean, total)
            total = jnp.where(phase["in_seg_pretrain"], seg_mean, total)
            return {"total": total, "seg_loss": seg_mean, "sr_loss": sr_mean,
                    "fa_loss": fa}

        # ---- combiner (trainer.py:406-438)
        if sr_none:
            # SCALE_FACTOR==1 / bicubic: the reference returns segment_loss
            # WITHOUT calc_pretrain_loss (trainer.py:416-417 hits neither
            # branch that calls it), so the window overrides must not apply.
            total = seg_mean
        else:
            if joint:
                total = (1.0 - phase["w_task"]) * sr_mean + phase["w_task"] * seg_mean
            else:
                total = sr_mean if sr_seg_inv else seg_mean
            total = jnp.where(phase["in_sr_pretrain"], sr_mean, total)
            total = jnp.where(phase["in_seg_pretrain"], seg_mean, total)

        out = {"total": total, "seg_loss": seg_mean, "sr_loss": sr_mean}
        if kernel_2d is not None:
            out["kernel_pred_2d"] = kernel_2d
        return out

    return loss_fn
