"""Pretrained checkpoint loading (reference `build_model.py:96-110,345-349`).

Loads the released .pth files (DBPN/KBPN pretrain, torchvision backbones)
into flax variables when present under weights/; prints-and-continues when
absent (this image ships no weights), mirroring the SR_SCRATCH switch.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .torch_convert import convert_tree, strip_prefixes, ConversionError
from . import translators


def load_torch_state_dict(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v) for k, v in sd.items()}


def _sr_ckpt_path(cfg) -> Optional[str]:
    sf, n = cfg.MODEL.SCALE_FACTOR, cfg.MODEL.NUM_STAGES
    if cfg.MODEL.SR == "DBPN":
        return os.path.join("weights", "pretrain", f"DBPN_pretrain_x{sf}_stage{n}.pth")
    if cfg.MODEL.SR == "KBPN":
        if cfg.BLUR.KERNEL_SIZE == cfg.BLUR.KERNEL_SIZE_OUTPUT:
            return os.path.join("weights", "pretrain", f"KBPN_pretrain_x{sf}_stage{n}.pth")
        return os.path.join(
            "weights", "pretrain",
            f"KBPN_pretrain_x{sf}_stage{n}_bicubic{cfg.BLUR.KERNEL_SIZE}.pth",
        )
    return None


def sr_translator_for(cfg):
    if cfg.MODEL.SR == "KBPN":
        return translators.translate_kbpn
    if cfg.MODEL.SR == "DBPN":
        return translators.translate_dbpn
    if cfg.MODEL.SR == "SrcNet":
        return translators.translate_srcnet_sr
    return None


def seg_translator_for(cfg):
    d = cfg.MODEL.DETECTOR_TYPE
    if d == "u-net16":
        return translators.translate_unet16
    if d.startswith("PSPNet"):
        return translators.translate_pspnet
    if d == "HRNet_OCR":
        return translators.translate_hrnet_ocr
    if d == "CrackFormer":
        return translators.translate_crackformer
    if d == "SegNet":
        return translators.translate_segnet
    return None


def _find_weight(*patterns) -> Optional[str]:
    import glob

    for pat in patterns:
        hits = sorted(glob.glob(os.path.join("weights", "pretrain", pat)))
        if hits:
            return hits[0]
    return None


def load_imagenet_backbones(cfg, params, batch_stats, log_fn=print) -> Tuple:
    """Inject published ImageNet backbone weights where the reference does:
    VGG16 into the KBPN feat head (`kbpn.py:42-44`) and the UNet16 encoder
    (`unet.py:143-176`), ResNet34 into the PSPNet extractor
    (`extractors.py:158-163`), HRNet-W48 into the OCR backbone
    (`H_48_D_4_composite.json:84`), ResNet101 into DSRL's DeepLab.

    Looks under weights/pretrain/; silently skips what isn't on disk.
    """
    jobs = []  # (module_key, translator, weight_path, label)
    if cfg.MODEL.SR == "KBPN" and "sr_model" in params:
        p = _find_weight("vgg16*.pth")
        if p:
            jobs.append(("sr_model", translators.imagenet_vgg16_kbpn_feat, p, "VGG16->KBPN.feat"))
    d = cfg.MODEL.DETECTOR_TYPE
    if "segmentation_model" in params:
        if d == "u-net16":
            p = _find_weight("vgg16*.pth")
            if p:
                jobs.append(("segmentation_model", translators.imagenet_vgg16_unet16, p, "VGG16->UNet16.encoder"))
        elif d.startswith("PSPNet"):
            # weight file must match the configured extractor backend; the
            # densenet/squeezenet extractors have no torchvision-name
            # translator, so they are skipped (trained from scratch)
            backend = str(cfg.TPU.PSPNET_BACKEND)
            if backend.startswith("resnet"):
                p = _find_weight(f"{backend}*.pth")
                if p:
                    jobs.append(("segmentation_model", translators.imagenet_resnet_pspnet,
                                 p, f"{backend}->PSPNet.feats"))
        elif d == "HRNet_OCR":
            p = _find_weight("hrnetv2_w48_imagenet_pretrained.pth", "hrnetv2_w48*.pth")
            if p:
                jobs.append(("segmentation_model", translators.imagenet_hrnet_w48, p, "HRNet-W48->OCR.backbone"))
    if "parallel_model" in params and cfg.TPU.DSRL_BACKBONE == "resnet":
        # only the resnet backbone matches torchvision resnet101 names
        p = _find_weight("resnet101*.pth")
        if p:
            jobs.append(("parallel_model", translators.imagenet_resnet_dsrl, p, "ResNet101->DSRL.backbone"))

    for mod, translate, path, label in jobs:
        sd = strip_prefixes(load_torch_state_dict(path))
        stats = batch_stats.get(mod, {}) if batch_stats else {}
        try:
            new_p, new_s, n = convert_tree(params[mod], stats, sd, translate, partial=True)
        except ConversionError as e:
            log_fn(f"(ImageNet init {label} from {path} failed: {e}; skipping)")
            continue
        params = dict(params, **{mod: new_p})
        if batch_stats and stats:
            batch_stats = dict(batch_stats, **{mod: new_s})
        log_fn(f"ImageNet init: {label} from {path} ({n} tensors)")
    return params, batch_stats


def load_pretrained_dsrl(cfg, params, batch_stats, log_fn=print) -> Tuple:
    """DSRL pretrained load (`build_model.py:345-349`): weights/DSRLx4.pth
    when DSRL_UPSAMPLE == 'deconv' (the DeepLabx4 variant) else
    weights/DSRL.pth; keys carry no parallel_model. prefix on disk (the
    reference *adds* one to match its module tree - ours converts directly
    into the parallel_model subtree)."""
    if "parallel_model" not in params or cfg.MODEL.SR_SCRATCH:
        return params, batch_stats
    if cfg.TPU.DSRL_BACKBONE != "resnet":
        # the released DSRL(.x4).pth holds the resnet backbone; other
        # backbones train from scratch
        log_fn(f"(DSRL backbone {cfg.TPU.DSRL_BACKBONE!r}: released weights not applicable)")
        return params, batch_stats
    fname = "DSRLx4" if cfg.MODEL.DSRL_UPSAMPLE == "deconv" else "DSRL"
    path = os.path.join("weights", f"{fname}.pth")
    if not os.path.isfile(path):
        log_fn(f"(pretrained DSRL weights not found at {path}; training from scratch)")
        return params, batch_stats
    sd = strip_prefixes(load_torch_state_dict(path), words=("module.", "parallel_model."))
    translate = translators.make_translate_dsrl(cfg.MODEL.SCALE_FACTOR)
    stats = batch_stats.get("parallel_model", {}) if batch_stats else {}
    try:
        new_p, new_s = convert_tree(params["parallel_model"], stats, sd, translate)
    except ConversionError as e:
        log_fn(f"(pretrained DSRL conversion incomplete: {e}; training from scratch)")
        return params, batch_stats
    params = dict(params, parallel_model=new_p)
    if batch_stats and stats:
        batch_stats = dict(batch_stats, parallel_model=new_s)
    log_fn(f"DSRL pretrained model was loaded from {path}")
    return params, batch_stats


def convert_joint_checkpoint(cfg, params, batch_stats, torch_sd, log_fn=print) -> Tuple:
    """Convert a full released joint checkpoint (iteration_N.pth holding
    sr_model.* + segmentation_model.* / parallel_model.*,
    `build_model.py:323-438` module layout; loaded with prefix fixing per
    `misc.py:35-44`) into the flax (params, batch_stats) pair. Strict per
    module: raises ConversionError listing any unmatched leaf."""
    sd = strip_prefixes(torch_sd, words=("module.",))
    translators_by_module = {
        "sr_model": sr_translator_for(cfg),
        "segmentation_model": seg_translator_for(cfg),
        "parallel_model": translators.make_translate_dsrl(cfg.MODEL.SCALE_FACTOR),
    }
    for mod in params:
        translate = translators_by_module.get(mod)
        if translate is None:
            raise ConversionError(f"no translator for module {mod!r} (cfg {cfg.MODEL.SR}/{cfg.MODEL.DETECTOR_TYPE})")
        prefix = f"{mod}."
        sub_sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        if not sub_sd:
            raise ConversionError(f"checkpoint holds no {prefix}* tensors")
        stats = batch_stats.get(mod, {}) if batch_stats else {}
        new_p, new_s = convert_tree(params[mod], stats, sub_sd, translate)
        params = dict(params, **{mod: new_p})
        if batch_stats and stats:
            batch_stats = dict(batch_stats, **{mod: new_s})
        log_fn(f"converted {mod}: {len(sub_sd)} torch tensors")
    return params, batch_stats


def load_pretrained_sr(cfg, params, batch_stats, log_fn=print) -> Tuple:
    """Fill sr_model params from the released pretrain checkpoint if found."""
    if cfg.MODEL.SR_SCRATCH:
        return params, batch_stats
    path = _sr_ckpt_path(cfg)
    if path is None or not os.path.isfile(path):
        if path is not None:
            log_fn(f"(pretrained SR weights not found at {path}; training from scratch)")
        return params, batch_stats
    sd = strip_prefixes(load_torch_state_dict(path))
    translate = translators.translate_kbpn if cfg.MODEL.SR == "KBPN" else translators.translate_dbpn
    sr_params = params["sr_model"]
    sr_stats = batch_stats.get("sr_model", {}) if batch_stats else {}
    try:
        new_p, new_s = convert_tree(sr_params, sr_stats, sd, translate)
    except ConversionError as e:
        log_fn(f"(pretrained SR conversion incomplete: {e}; training from scratch)")
        return params, batch_stats
    params = dict(params, sr_model=new_p)
    if batch_stats and sr_stats:
        batch_stats = dict(batch_stats, sr_model=new_s)
    log_fn(f"SR pretrained model was loaded from {path}")
    return params, batch_stats
