"""openseg-style JSON Configer for the HRNet subtree.

Rebuild of `/root/reference/model/modeling/hrnet_ocr/tools/configer.py:19-156`
and `set_config.py:42-176`: nested-JSON config with `get('a', 'b')` access,
used by the reference to select backbone ('hrnet48') and bn_type ('torchbn',
`config/H_48_D_4_composite.json:78-84`).  Our HRNetW48OCR takes the resolved
values; this shim preserves the JSON config surface so openseg-style configs
drive the same choices.
"""
from __future__ import annotations

import json
import os
from typing import Any

_DEFAULT = {
    "network": {"backbone": "hrnet48", "bn_type": "torchbn", "pretrained": None},
    "data": {"num_classes": 1},
}


class Configer:
    def __init__(self, config_dict=None):
        self._cfg = dict(_DEFAULT)
        if config_dict:
            for k, v in config_dict.items():
                if isinstance(v, dict) and isinstance(self._cfg.get(k), dict):
                    self._cfg[k] = {**self._cfg[k], **v}
                else:
                    self._cfg[k] = v

    def get(self, *keys, default=None) -> Any:
        node = self._cfg
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                return default
            node = node[k]
        return node

    def exists(self, *keys) -> bool:
        return self.get(*keys) is not None


def set_configer(json_path: str) -> Configer:
    """Load an openseg JSON config (set_config.py entry point)."""
    if os.path.isfile(json_path):
        with open(json_path) as f:
            return Configer(json.load(f))
    return Configer()


def hrnet_from_configer(configer: Configer, dtype=None):
    """Build the segmentation head the configer selects."""
    import jax.numpy as jnp

    from .hrnet_ocr import HRNetW48OCR

    backbone = configer.get("network", "backbone", default="hrnet48")
    widths = {"hrnet18": 18, "hrnet32": 32, "hrnet48": 48, "hrnet64": 64}
    if backbone not in widths:
        raise NotImplementedError(f"backbone {backbone} (choices: {sorted(widths)})")
    num_classes = configer.get("data", "num_classes", default=1)
    return HRNetW48OCR(num_classes=num_classes, width=widths[backbone],
                       dtype=dtype or jnp.float32)
