"""Phase schedule: iteration -> scalar pytree.

The reference drives training phases by mutating module state per iteration
(`kbpn.py:118-155`, `trainer.py:468-530`, `loss_functions.py:76-82`).  Here
every phase quantity is a pure function of the (traced) iteration scalar so
the train step compiles once - no retrace storms, no Python-side state.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax.numpy as jnp


class PhaseConfig(NamedTuple):
    """Static schedule windows extracted from the config."""

    sr_pretrain: tuple  # SOLVER.SR_PRETRAIN_ITER
    sr_sr_module: tuple  # SOLVER.SR_SR_MODULE_PRETRAIN_ITER (GT-kernel window)
    sr_kernel_module: tuple  # SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER
    seg_pretrain: tuple  # SOLVER.SEG_PRETRAIN_ITER
    task_loss_weight: float  # beta; -1 => ramp
    increase_task_w: tuple  # SOLVER.INCRESE_TASK_W_ITER
    per_epoch: int  # boundary-alpha epoch length
    alpha_min: float
    decrease_ratio: float
    joint_learning: bool
    scheduler: bool  # UpDownScheduler on/off


def phase_config_from_cfg(cfg, num_train_ds: int) -> PhaseConfig:
    per_epoch = num_train_ds // cfg.SOLVER.BATCH_SIZE + 1
    return PhaseConfig(
        sr_pretrain=tuple(cfg.SOLVER.SR_PRETRAIN_ITER),
        sr_sr_module=tuple(cfg.SOLVER.SR_SR_MODULE_PRETRAIN_ITER),
        sr_kernel_module=tuple(cfg.SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER),
        seg_pretrain=tuple(cfg.SOLVER.SEG_PRETRAIN_ITER),
        task_loss_weight=float(cfg.SOLVER.TASK_LOSS_WEIGHT),
        increase_task_w=tuple(cfg.SOLVER.INCRESE_TASK_W_ITER),
        per_epoch=per_epoch,
        alpha_min=float(cfg.SOLVER.ALPHA_MIN),
        decrease_ratio=float(cfg.SOLVER.DECREASE_RATIO),
        joint_learning=bool(cfg.MODEL.JOINT_LEARNING),
        scheduler=bool(cfg.SOLVER.SCHEDULER),
    )


def _in_window(it, window):
    lo, hi = window
    return (it >= lo) & (it < hi)


def compute_phase(it, pc: PhaseConfig) -> Dict[str, Any]:
    """All phase scalars for iteration `it` (traced int32 ok)."""
    it = jnp.asarray(it, jnp.int32)
    in_sr_pre = _in_window(it, pc.sr_pretrain)
    in_seg_pre = _in_window(it, pc.seg_pretrain)
    use_gt_kernel = _in_window(it, pc.sr_sr_module)
    in_kernel_window = _in_window(it, pc.sr_kernel_module)

    # BoundaryCombo alpha (loss_functions.py:37-41,76-82 + trainer freeze
    # during SR pretrain): counts epochs elapsed after the SR-pretrain window.
    seg_it = jnp.maximum(0, it - (pc.sr_pretrain[1] - 1))
    alpha = 1.0 - (seg_it // pc.per_epoch).astype(jnp.float32) * 0.01 * pc.decrease_ratio
    alpha = jnp.clip(alpha, pc.alpha_min, 1.0)

    # task weight beta (trainer.py:414-421,455-464)
    if pc.task_loss_weight == -1:
        a, b = pc.increase_task_w
        w_task = (it - a).astype(jnp.float32) / float(b - a)
        w_task = jnp.minimum(w_task, 1.0)
    else:
        w_task = jnp.asarray(pc.task_loss_weight, jnp.float32)

    # UpDownScheduler (lr_scheduler.py:31-43): x10 between main-iters 70k-95k
    it_main = it - (pc.sr_pretrain[1] - 1)
    lr_mult = jnp.where(
        pc.scheduler & (it_main > 70000) & (it_main < 95000), 10.0, 1.0
    )

    return {
        "iteration": it,
        "in_sr_pretrain": in_sr_pre,
        "in_seg_pretrain": in_seg_pre,
        "use_gt_kernel": use_gt_kernel,
        "in_kernel_window": in_kernel_window,
        "alpha": alpha,
        "w_task": w_task,
        "lr_mult": lr_mult,
    }
