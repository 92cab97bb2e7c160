"""Segmentation losses.

Functional rebuild of `/root/reference/model/utils/loss_functions.py` and
`boundary_loss.py`.  All losses are pure functions over NHWC arrays returning
per-sample (B,) losses (the reference's reduction='none' convention); the
BoundaryCombo alpha schedule is an explicit scalar argument carried in the
train state instead of a mutable module attribute (`loss_functions.py:76-82`).

The boundary-loss SDF runs on device via ops.edt (the reference computes it
on CPU with scipy per step, `boundary_loss.py:28`).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.edt import sdf_normalized

_SMOOTH_BCE = 1e-8


def weighted_bce(predict, target, pos_weight: Sequence[float] = (1, 1), per_pixel=False):
    """WeightedBCELoss (`loss_functions.py:189-210`); mean over HWC per sample.

    The complement is clipped BEFORE its log rather than written as the
    reference's literal `log(1 - p + eps)`: XLA on TPU reassociates
    `1.0 - p + eps` into `(1.0 + eps) - p`, which rounds back to `1.0 - p`
    in f32 — so when bf16-saturated probabilities hit exactly 1.0 the log
    returns -inf and the `(1-t)*log(...)` product becomes 0*inf = NaN
    (first seen as the round-5 dress-rehearsal NaN at the joint-phase
    onset; CPU evaluates strictly left-to-right and never trips it). The
    clip is an ordering barrier the reassociator cannot cross, and is
    bit-identical to the reference arithmetic for every p <= 1 - eps.
    """
    p = jnp.clip(predict, _SMOOTH_BCE, None)
    q = jnp.clip(1.0 - p, _SMOOTH_BCE, None)
    w0, w1 = pos_weight
    loss = -(
        w0 * target * jnp.log(p + _SMOOTH_BCE)
        + w1 * (1.0 - target) * jnp.log(q + _SMOOTH_BCE)
    ) / (w0 + w1)
    if per_pixel:
        return loss
    return jnp.mean(loss, axis=(1, 2, 3))


def binary_dice(predict, target, smooth: float = 1e-6, p: int = 2, per_pixel=False):
    """BinaryDiceLoss (`loss_functions.py:258-312`), per-sample.

    per_pixel=True is the out_map variant (`:292-296`) used when per-pixel
    weighting (w^f) is enabled.
    """
    if per_pixel:
        num = 2.0 * jnp.sum(predict * target, axis=-1, keepdims=True) + smooth
        den = jnp.sum(predict**p + target**p) + smooth
        return 1.0 / target.size - num / den
    pred = predict.reshape(predict.shape[0], -1)
    tgt = target.reshape(target.shape[0], -1)
    num = 2.0 * jnp.sum(pred * tgt, axis=1) + smooth
    den = jnp.sum(pred**p + tgt**p, axis=1) + smooth
    return 1.0 - num / den


def generalized_dice(predict, target, smooth: float = 1e-5):
    """GDiceLoss (`loss_functions.py:213-254`), binary channel case."""
    w = 1.0 / (jnp.sum(target, axis=(1, 2)) ** 2 + 1e-10)  # (B, C)
    inter = w * jnp.sum(predict * target, axis=(1, 2))
    union = w * (jnp.sum(predict, axis=(1, 2)) + jnp.sum(target, axis=(1, 2)))
    return 1.0 - 2.0 * (jnp.sum(inter, axis=-1) + smooth) / (jnp.sum(union, axis=-1) + smooth)


def bce_dice(
    predict,
    target,
    pos_weight: Sequence[float] = (1, 1),
    loss_weight: Sequence[float] = (1, 1),
    gdice: bool = False,
    per_pixel: bool = False,
):
    """BCE_DiceLoss (`loss_functions.py:315-345`)."""
    bce = weighted_bce(predict, target, pos_weight, per_pixel=per_pixel)
    if gdice:
        dice = generalized_dice(predict, target)
    else:
        dice = binary_dice(predict, target, per_pixel=per_pixel)
    lw0, lw1 = loss_weight
    return (lw0 * bce + lw1 * dice) / (lw0 + lw1)


def boundary_loss(predict, target, per_pixel=False):
    """BoundaryLoss (`boundary_loss.py:12-38`): mean(pred * normalised SDF).

    target: (B, H, W, C) binary. SDF computed on device (ops.edt).
    """
    mask = jnp.moveaxis(target, -1, 1) > 0.5  # (B, C, H, W)
    sdf = sdf_normalized(mask)
    sdf = jnp.moveaxis(sdf, 1, -1).astype(predict.dtype)
    sdf = jax.lax.stop_gradient(sdf)
    mult = predict * sdf
    if per_pixel:
        return mult
    return jnp.mean(mult, axis=(1, 2, 3))


def boundary_combo_loss(
    predict,
    target,
    alpha,
    pos_weight: Sequence[float] = (1, 1),
    loss_weight: Sequence[float] = (1, 1),
    per_pixel: bool = False,
):
    """BoundaryComboLoss (`loss_functions.py:26-82`).

    alpha: traced scalar in [alpha_min, 1]; schedule lives in the train state
    (see engine.schedules.boundary_alpha).
    predict is clamped to >= 1e-8 like the reference (`:52`).
    """
    predict = jnp.clip(predict, _SMOOTH_BCE, None)
    if per_pixel:
        # out_map=True decomposes into per-SAMPLE components because the
        # reference's per-pixel map is a broadcasting accident: BCE_DiceLoss
        # adds the (B,1,H,W) WBCE map to the (B,H,W) dice out_map
        # (`loss_functions.py:334-335` + `:292-296`), which torch broadcasts
        # to (B,B,H,W) — BCE of sample i paired with dice of sample j for
        # ALL (i,j).  We return the two factors
        #     paired[i] = alpha*c0*bce[i] + (1-alpha)*bd[i]   (dim 0 of the map)
        #     cross[j]  = alpha*c1*dice[j]                    (dim 1 of the map)
        # so the consumer can reduce map[i,j] = paired[i] + cross[j] exactly
        # (engine/losses_glue.py) without materialising B^2 maps.
        lw0, lw1 = loss_weight
        bce_map = weighted_bce(predict, target, pos_weight, per_pixel=True)
        dice_map = binary_dice(predict, target, per_pixel=True)
        bd_map = boundary_loss(predict, target, per_pixel=True)
        paired = alpha * (lw0 / (lw0 + lw1)) * bce_map + (1.0 - alpha) * bd_map
        cross = alpha * (lw1 / (lw0 + lw1)) * dice_map
        return paired, cross
    wd = bce_dice(predict, target, pos_weight, loss_weight)
    bd = boundary_loss(predict, target)
    return alpha * wd + (1.0 - alpha) * bd


def boundary_gdice_loss(predict, target, alpha):
    """Boundary_GDiceLoss (`loss_functions.py:138-187`)."""
    predict = jnp.clip(predict, _SMOOTH_BCE, None)
    return alpha * generalized_dice(predict, target) + (1.0 - alpha) * boundary_loss(predict, target)


def generalized_boundary_combo_loss(
    predict, target, alpha,
    pos_weight: Sequence[float] = (1, 1),
    loss_weight: Sequence[float] = (1, 1),
):
    """GeneralizedBoundaryComboLoss (`loss_functions.py:86-128`)."""
    predict = jnp.clip(predict, _SMOOTH_BCE, None)
    wd = bce_dice(predict, target, pos_weight, loss_weight, gdice=True)
    return alpha * wd + (1.0 - alpha) * boundary_loss(predict, target)


def bce(predict, target):
    """torch nn.BCELoss() (scalar mean) - 'BCE' option (`build_model.py:283-284`)."""
    p = jnp.clip(predict, 1e-7, 1.0 - 1e-7)
    loss = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(loss, axis=(1, 2, 3))


def cross_entropy_loss_rcf(prediction, label):
    """CrackFormer class-balanced BCE (`model/utils/CrackFormerLoss/lossFunctions.py:13-90`).

    Per-sample class-balanced sigmoid BCE: weights = beta for positives,
    1.1*(1-beta) for negatives, beta = num_neg / (num_pos + num_neg).
    prediction is already sigmoid-ed (reference applies it in the model).
    """
    label_f = (label > 0.5).astype(prediction.dtype)
    num_pos = jnp.sum(label_f, axis=(1, 2, 3), keepdims=True)
    num_neg = jnp.sum(1.0 - label_f, axis=(1, 2, 3), keepdims=True)
    beta = num_neg / jnp.maximum(num_pos + num_neg, 1.0)
    weight = jnp.where(label_f > 0.5, beta, 1.1 * (1.0 - beta))
    p = jnp.clip(prediction, 1e-7, 1.0 - 1e-7)
    loss = -(label_f * jnp.log(p) + (1.0 - label_f) * jnp.log(1.0 - p)) * weight
    return jnp.sum(loss, axis=(1, 2, 3))
