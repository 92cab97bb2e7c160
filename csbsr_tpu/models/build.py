"""Model composition: config-driven joint SR + segmentation model.

Rebuild of `/root/reference/model/modeling/build_model.py`.  The reference
composes behaviour with cooperative-MRO mixins whose forward mutates state
(`build_model.py:50-562`); here composition is a single flax module whose
static fields are derived from the config, and whose __call__ is pure:

    outputs = model.apply(vars, lr_imgs, kernel_gt_vec, use_gt_kernel,
                          sr_targets=..., train=...)
    -> {"sr": ..., "kernel": (B,k_out^2), "seg": ..., "aux": ...}

Loss calculation lives in engine.losses_glue (pure functions), not in the
module - the WithLoss/NoLoss split of the reference collapses into
train-step vs eval-step functions.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from .dbpn import DBPN
from .kbpn import KBPN
from .unet import UNet16
from .pspnet import PSPNet, PSPNetBlurSkip
from .srcnet import SrcNetSR, SegNet
from ..ops.resize import resize

SEG_RETURNS_AUX = ("PSPNet", "PSPNet_BlurSkip", "PSPNet_BlurSkip_origin",
                   "PSPNet_BlurSkipReduct", "HRNet_OCR", "CrackFormer")
BLURSKIP_TYPES = ("PSPNet_BlurSkip", "PSPNet_BlurSkip_origin", "PSPNet_BlurSkipReduct")


def _norm_sr(sr, method: str, mean, std):
    """MetaSRModel.norm_sr (`build_model.py:125-141`)."""
    if method == "all":
        m = jnp.asarray(mean, sr.dtype).reshape(1, 1, 1, -1)
        s = jnp.asarray(std, sr.dtype).reshape(1, 1, 1, -1)
        return (sr - m) / s
    if method == "instance":
        mu = jnp.mean(sr, axis=(1, 2), keepdims=True)
        var = jnp.var(sr, axis=(1, 2), keepdims=True)
        return (sr - mu) / jnp.sqrt(var + 1e-5)
    return sr


class CSBSRModel(nn.Module):
    """Joint model. Static composition fields mirror cfg.MODEL/cfg.BLUR."""

    sr: str = "KBPN"  # 'KBPN' | 'DBPN' | 'SrcNetSR' | 'bicubic' | 'none'
    detector: str = "PSPNet"
    scale_factor: int = 4
    num_stages: int = 4
    num_classes: int = 1
    estimate_ksize: int = 21
    ksize_output: int = 21
    kernel_sft: bool = True
    residual_learning: bool = True
    pixel_shuffle: bool = False
    sum_lr_error_pos: str = "HR"
    zero_pad_kernel: bool = False
    up_sample_method: str = "deconv"  # UNet decoder mode
    norm_sr_output: str = "all"
    input_mean: tuple = (0.4741, 0.4937, 0.5048)
    input_std: tuple = (0.1621, 0.1532, 0.1523)
    sr_seg_inv: bool = False
    dsrl_upsample: str = "bilinear"  # 'deconv' => DeepLabx4 native chain
    dsrl_backbone: str = "resnet"  # 'resnet' | 'drn' (DRN-D-54)
    pspnet_backend: str = "resnet34"  # extractors.py zoo
    sr_only: bool = False  # SR pretraining (SRModelWithLoss, build_model.py:535-562)
    remat: bool = False
    remat_scope: str = "full"  # 'full' | 'updown' (KBPN selective remat)
    remat_seg: bool = False  # jax.checkpoint the whole segmentation head
    dtype: Any = jnp.float32

    def _build_sr(self):
        num_channels = 1 if self.sr_seg_inv else 3
        if self.scale_factor == 1 or self.sr in ("none", "bicubic"):
            return None
        if self.sr == "KBPN":
            return KBPN(
                scale_factor=self.scale_factor, num_stages=self.num_stages,
                num_channels=num_channels, estimate_ksize=self.estimate_ksize,
                ksize_output=self.ksize_output, kernel_sft=self.kernel_sft,
                residual_learning=self.residual_learning,
                pixel_shuffle=self.pixel_shuffle,
                sum_lr_error_pos=self.sum_lr_error_pos,
                zero_pad_kernel=self.zero_pad_kernel,
                remat=self.remat,
                remat_scope=self.remat_scope,
                dtype=self.dtype, name="sr_model",
            )
        if self.sr == "DBPN":
            return DBPN(scale_factor=self.scale_factor, num_channels=num_channels,
                        num_stages=self.num_stages, dtype=self.dtype, name="sr_model")
        if self.sr == "SrcNetSR":
            return SrcNetSR(scale_factor=self.scale_factor, dtype=self.dtype, name="sr_model")
        raise NotImplementedError(self.sr)

    def _build_seg(self):
        # remat_seg: checkpoint the whole head - its call signature is
        # (x[, cond], train), so `train` is the last (static) argument
        def R(cls, n_args):
            return nn.remat(cls, static_argnums=(n_args,)) if self.remat_seg else cls

        if self.detector == "u-net16":
            return R(UNet16, 2)(num_classes=self.num_classes,
                                up_sampling_method=self.up_sample_method,
                                dtype=self.dtype, name="segmentation_model")
        if self.detector == "PSPNet":
            return R(PSPNet, 2)(n_classes=self.num_classes, backend=self.pspnet_backend,
                                dtype=self.dtype, name="segmentation_model")
        if self.detector in ("PSPNet_BlurSkip", "PSPNet_BlurSkip_origin"):
            return R(PSPNetBlurSkip, 3)(
                n_classes=self.num_classes,
                modify_blur_skip=(self.detector == "PSPNet_BlurSkip"),
                dtype=self.dtype, name="segmentation_model",
            )
        if self.detector == "PSPNet_BlurSkipReduct":
            return R(PSPNetBlurSkip, 3)(n_classes=self.num_classes, dtype=self.dtype,
                                        name="segmentation_model")
        if self.detector == "SegNet":
            return R(SegNet, 2)(dtype=self.dtype, name="segmentation_model")
        if self.detector == "HRNet_OCR":
            from .hrnet_ocr import HRNetW48OCR

            return R(HRNetW48OCR, 2)(num_classes=self.num_classes, dtype=self.dtype,
                                     name="segmentation_model")
        if self.detector == "CrackFormer":
            from .crackformer import CrackFormer

            return R(CrackFormer, 2)(dtype=self.dtype, name="segmentation_model")
        raise NotImplementedError(self.detector)

    def _forward_sr(self, x, kernel_gt_vec, use_gt_kernel, sr_targets, train):
        """MetaSRModel.forward_sr (`build_model.py:63-80`)."""
        k2 = self.ksize_output**2
        if self.scale_factor == 1:
            sr_preds = sr_targets
            kernel_vec = jnp.zeros((x.shape[0], k2), self.dtype)
        elif self.sr == "bicubic":
            out_hw = (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor)
            sr_preds = resize(x, out_hw, method="bicubic")
            kernel_vec = jnp.zeros((x.shape[0], k2), self.dtype)
        elif self.sr == "KBPN":
            sr_preds, kernel_vec = self._build_sr()(x, kernel_gt_vec, use_gt_kernel, train)
        else:
            sr_preds = self._build_sr()(x, train)
            kernel_vec = jnp.zeros((x.shape[0], k2), self.dtype)
        return sr_preds, kernel_vec

    def _forward_ss(self, sr_norm, kernel_vec, train):
        """MetaSSModel.forward_ss + BlurSkip kernel injection
        (`build_model.py:199-206,400-408`)."""
        seg_model = self._build_seg()
        if self.detector in BLURSKIP_TYPES:
            cond = kernel_vec
            if self.detector == "PSPNet_BlurSkipReduct":
                # kernel downsampled to KERNEL_SIZE^2 (build_model.py:404-408)
                k2d = kernel_vec.reshape(-1, self.ksize_output, self.ksize_output, 1)
                k2d = resize(k2d, (self.estimate_ksize, self.estimate_ksize),
                             method="bicubic", align_corners=True)
                cond = k2d.reshape(-1, self.estimate_ksize**2)
            return seg_model(sr_norm, cond, train)
        out = seg_model(sr_norm, train)
        if self.detector in SEG_RETURNS_AUX:
            return out
        return out, None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        kernel_gt_vec: Optional[jnp.ndarray] = None,
        use_gt_kernel=False,
        sr_targets: Optional[jnp.ndarray] = None,
        train: bool = False,
        clip_sr: bool = False,
    ):
        if self.sr == "DSRL" and self.detector == "DSRL":
            # parallel DSRL path (`build_model.py:335-350,370-397`)
            from .dsrl import DSRL

            sf = 4 if self.dsrl_upsample == "deconv" else 2
            seg, sr, fea_seg, fea_sr = DSRL(
                num_classes=self.num_classes, scale_factor=sf,
                backbone=self.dsrl_backbone,
                dtype=self.dtype, name="parallel_model",
            )(x, train)
            if self.dsrl_upsample != "deconv":
                out_hw = (x.shape[1] * self.scale_factor, x.shape[2] * self.scale_factor)
                sr = resize(sr, out_hw, method=self.dsrl_upsample, align_corners=True)
                seg = resize(seg, out_hw, method=self.dsrl_upsample, align_corners=True)
            if clip_sr:
                sr = jnp.clip(sr, 0.0, 1.0)
            kernel_vec = jnp.zeros((x.shape[0], self.ksize_output**2), self.dtype)
            return {"sr": sr, "kernel": kernel_vec, "seg": seg, "aux": None,
                    "fea_seg": fea_seg, "fea_sr": fea_sr}

        if self.sr_seg_inv:
            # JointInvModel (`build_model.py:503-532`): segment LR, then SR
            # the (single-channel) segmentation map.
            lr_seg, lr_aux = self._forward_ss(x, kernel_gt_vec, train)
            seg_preds, kernel_vec = self._forward_sr(
                lr_seg, kernel_gt_vec, use_gt_kernel, sr_targets, train
            )
            if clip_sr:
                seg_preds = jnp.clip(seg_preds, 0.0, 1.0)
            return {"sr": seg_preds, "kernel": kernel_vec, "seg": seg_preds,
                    "aux": lr_aux, "lr_seg": lr_seg}

        sr_preds, kernel_vec = self._forward_sr(
            x, kernel_gt_vec, use_gt_kernel, sr_targets, train
        )
        if clip_sr:
            sr_preds = jnp.clip(sr_preds, 0.0, 1.0)
        if self.sr_only:
            return {"sr": sr_preds, "kernel": kernel_vec, "seg": None, "aux": None}
        sr_norm = _norm_sr(sr_preds, self.norm_sr_output, self.input_mean, self.input_std)
        seg_preds, aux_preds = self._forward_ss(sr_norm, kernel_vec, train)
        return {"sr": sr_preds, "kernel": kernel_vec, "seg": seg_preds, "aux": aux_preds}


def model_from_cfg(cfg, dtype=None) -> CSBSRModel:
    if dtype is None:
        dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)  # bf16 compute, f32 params
    return CSBSRModel(
        sr=cfg.MODEL.SR,
        detector=cfg.MODEL.DETECTOR_TYPE,
        scale_factor=cfg.MODEL.SCALE_FACTOR,
        num_stages=cfg.MODEL.NUM_STAGES,
        num_classes=cfg.MODEL.NUM_CLASSES,
        estimate_ksize=cfg.BLUR.KERNEL_SIZE,
        ksize_output=cfg.BLUR.KERNEL_SIZE_OUTPUT,
        kernel_sft=cfg.MODEL.KBPN_KERNEL_SFT,
        residual_learning=cfg.MODEL.SR_RESIDUAL_LEARNING,
        pixel_shuffle=cfg.MODEL.SR_PIXEL_SHUFFLE,
        sum_lr_error_pos=cfg.MODEL.SUM_LR_ERROR_POS,
        zero_pad_kernel=cfg.MODEL.ZERO_PAD_KERNEL,
        up_sample_method=cfg.MODEL.UP_SAMPLE_METHOD,
        norm_sr_output=cfg.SOLVER.NORM_SR_OUTPUT,
        input_mean=tuple(cfg.INPUT.MEAN),
        input_std=tuple(cfg.INPUT.STD),
        sr_seg_inv=cfg.MODEL.SR_SEG_INV,
        dsrl_upsample=cfg.MODEL.DSRL_UPSAMPLE,
        dsrl_backbone=cfg.TPU.DSRL_BACKBONE,
        pspnet_backend=cfg.TPU.PSPNET_BACKEND,
        sr_only=bool(cfg.DATASET.ONLY_IMAGES),
        remat=bool(cfg.TPU.REMAT),
        remat_scope=str(cfg.TPU.REMAT_SCOPE),
        remat_seg=bool(cfg.TPU.REMAT_SEG),
        dtype=dtype,
    )
