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
