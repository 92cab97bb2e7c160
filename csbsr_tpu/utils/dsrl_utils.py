"""DSRL standalone training utilities - TPU-native rebuild.

Rebuild of `/root/reference/model/modeling/DSRL/utils/{calculate_weights,
loss,lr_scheduler,metrics}.py` - the training-side toolkit the vendored
DSRL package ships for standalone (non-CSBSR) training runs.  The FALoss
from the same directory lives in `csbsr_tpu/losses/fa_loss.py`.

Two of the six files are closed out rather than rebuilt:

- `saver.py` (torch checkpoint directories + a plain-text best-pred file)
  is obsolete under orbax checkpointing (`engine/checkpoints.py` handles
  save/resume including optimizer state, bit-identically round-tripped).
- `summaries.py` (a torchvision `make_grid` -> tensorboard writer) is
  covered by the repo's eval sample dumps + wandb logging
  (`utils/logging.py`, `engine/inference.py`).

Everything here is functional and jit-friendly: losses and the confusion
matrix run on device; the Evaluator accumulates on host like the original.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ weights


def class_balance_weights(class_counts):
    """calculate_weights.py:20-26: w_c = 1 / log(1.02 + freq_c/total).

    Takes per-class pixel counts (host or device array) instead of a torch
    dataloader sweep; pair with `label_counts` over a data stream.
    """
    counts = jnp.asarray(class_counts, jnp.float32)
    freq = counts / jnp.sum(counts)
    return 1.0 / jnp.log(1.02 + freq)


def label_counts(labels, num_classes: int):
    """Per-class pixel counts of one label batch (calculate_weights.py:13-18:
    values outside [0, num_classes) are ignored).  jit-able; sum across
    batches on the caller side."""
    lab = jnp.asarray(labels).reshape(-1)
    valid = (lab >= 0) & (lab < num_classes)
    lab = jnp.where(valid, lab, num_classes)
    return jnp.bincount(lab.astype(jnp.int32), length=num_classes + 1)[:-1]


# ------------------------------------------------------------------- losses


def _weighted_ce(logits, target, weight, ignore_index):
    """torch nn.CrossEntropyLoss(weight, ignore_index, size_average=True):
    sum(w[t]*nll) / sum(w[t]) over non-ignored pixels.  NHWC logits."""
    c = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    t = jnp.asarray(target, jnp.int32)
    valid = t != ignore_index
    t_safe = jnp.where(valid, t, 0)
    nll = -jnp.take_along_axis(logp, t_safe[..., None], axis=-1)[..., 0]
    w = jnp.ones((c,), logits.dtype) if weight is None else jnp.asarray(weight, logits.dtype)
    pix_w = jnp.where(valid, w[t_safe], 0.0)
    return jnp.sum(pix_w * nll) / jnp.maximum(jnp.sum(pix_w), 1e-12)


class SegmentationLosses:
    """loss.py:4-51 SegmentationLosses: 'ce' and 'focal' built on a weighted
    ignore-aware cross-entropy; `batch_average` divides the scalar by the
    batch size (the reference default).  Logits are NHWC (B,H,W,C), target
    (B,H,W) integer."""

    def __init__(self, weight=None, batch_average: bool = True, ignore_index: int = 255):
        self.weight = weight
        self.batch_average = batch_average
        self.ignore_index = ignore_index

    def build_loss(self, mode: str = "ce") -> Callable:
        if mode == "ce":
            return self.cross_entropy
        if mode == "focal":
            return self.focal
        raise NotImplementedError(f"loss mode '{mode}' (choices: ce, focal)")

    def cross_entropy(self, logits, target):
        loss = _weighted_ce(logits, target, self.weight, self.ignore_index)
        return loss / logits.shape[0] if self.batch_average else loss

    def focal(self, logits, target, gamma: float = 2.0, alpha: Optional[float] = 0.5):
        # loss.py:35-50: the focal term wraps the *scalar* CE of the batch
        # (a reference quirk, kept): logpt=-CE, loss=-(1-e^logpt)^g*a*logpt
        logpt = -_weighted_ce(logits, target, self.weight, self.ignore_index)
        pt = jnp.exp(logpt)
        if alpha is not None:
            logpt = logpt * alpha
        loss = -((1.0 - pt) ** gamma) * logpt
        return loss / logits.shape[0] if self.batch_average else loss


# ---------------------------------------------------------------- schedule


def dsrl_lr_schedule(mode: str, base_lr: float, num_epochs: int,
                     iters_per_epoch: int, lr_step: int = 0,
                     warmup_epochs: int = 0) -> Callable:
    """lr_scheduler.py:13-59 as an optax-style schedule (step -> lr).

    cos:  0.5*lr*(1+cos(pi*T/N));  poly: lr*(1-T/N)^0.9;
    step: lr*0.1^(epoch//lr_step); linear warmup over warmup_epochs.
    """
    if mode == "step" and not lr_step:
        raise ValueError("step mode needs lr_step")
    n_total = num_epochs * iters_per_epoch
    warmup = warmup_epochs * iters_per_epoch

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(t / iters_per_epoch)
        if mode == "cos":
            lr = 0.5 * base_lr * (1.0 + jnp.cos(t / n_total * math.pi))
        elif mode == "poly":
            lr = base_lr * (1.0 - t / n_total) ** 0.9
        elif mode == "step":
            lr = base_lr * 0.1 ** jnp.floor(epoch / lr_step)
        else:
            raise NotImplementedError(f"lr mode '{mode}'")
        if warmup > 0:
            lr = jnp.where(t < warmup, lr * t / warmup, lr)
        return lr

    return schedule


def head_lr_transform(schedule: Callable, head_fn: Callable, momentum: float = 0.9):
    """lr_scheduler.py:61-70 _adjust_learning_rate: the non-backbone param
    groups train at 10x the scheduled LR.  `head_fn(path_tuple) -> bool`
    labels head params by their pytree path.  Returns an optax transform.
    """
    import optax

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "head" if head_fn(tuple(getattr(k, "key", k) for k in p))
            else "base", params)

    return optax.multi_transform(
        {"base": optax.sgd(schedule, momentum=momentum),
         "head": optax.sgd(lambda s: 10.0 * schedule(s), momentum=momentum)},
        label)


# ----------------------------------------------------------------- metrics


def confusion_matrix(gt, pred, num_class: int):
    """metrics.py:35-41 _generate_matrix on device: bincount of
    num_class*gt+pred over pixels with 0 <= gt < num_class."""
    g = jnp.asarray(gt).reshape(-1).astype(jnp.int32)
    p = jnp.asarray(pred).reshape(-1).astype(jnp.int32)
    valid = (g >= 0) & (g < num_class)
    idx = jnp.where(valid, num_class * g + p, num_class * num_class)
    cm = jnp.bincount(idx, length=num_class * num_class + 1)[:-1]
    return cm.reshape(num_class, num_class)


class Evaluator:
    """metrics.py:4-50 Evaluator: host-accumulated confusion matrix with the
    four reference scores.  The per-batch matrix is computed on device."""

    def __init__(self, num_class: int):
        self.num_class = num_class
        self.reset()

    def reset(self):
        self.matrix = np.zeros((self.num_class, self.num_class), np.float64)

    def add_batch(self, gt_image, pre_image):
        assert np.shape(gt_image) == np.shape(pre_image)
        self.matrix += np.asarray(confusion_matrix(gt_image, pre_image, self.num_class))

    def pixel_accuracy(self):
        return np.diag(self.matrix).sum() / self.matrix.sum()

    def pixel_accuracy_class(self):
        with np.errstate(invalid="ignore"):
            return np.nanmean(np.diag(self.matrix) / self.matrix.sum(axis=1))

    def mean_iou(self):
        with np.errstate(invalid="ignore"):
            iu = np.diag(self.matrix) / (self.matrix.sum(axis=1) + self.matrix.sum(axis=0)
                                         - np.diag(self.matrix))
        return np.nanmean(iu)

    def fw_iou(self):
        freq = self.matrix.sum(axis=1) / self.matrix.sum()
        with np.errstate(invalid="ignore"):
            iu = np.diag(self.matrix) / (self.matrix.sum(axis=1) + self.matrix.sum(axis=0)
                                         - np.diag(self.matrix))
        return (freq[freq > 0] * iu[freq > 0]).sum()
