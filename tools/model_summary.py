#!/usr/bin/env python
"""Model summary: per-submodule parameter counts and total size.

TPU-native analog of `/root/reference/model/modeling/check_model.py` (a
torchsummary one-off for KBPN): builds any configured model, initialises it
abstractly with jax.eval_shape (no memory, no device), and prints a
per-top-level-module parameter table plus totals.

Usage:
  python tools/model_summary.py [--config_file configs/...yaml] [opts K V ...]
  python tools/model_summary.py --hw 448  # reference check_model.py shapes
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config_file", type=str, default="")
    p.add_argument("--hw", type=int, default=224, help="HR eval size (LR = hw/SF)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    # Abstract init only (jax.eval_shape): no device needed, so pin CPU.
    # setdefault would be a silent no-op under an ambient JAX_PLATFORMS.
    os.environ["JAX_PLATFORMS"] = "cpu"
    from csbsr_tpu.utils.cache import honor_platform_env

    honor_platform_env()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.models import model_from_cfg

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = model_from_cfg(cfg)
    lr = args.hw // max(cfg.MODEL.SCALE_FACTOR, 1)
    patches = jax.ShapeDtypeStruct((1, lr, lr, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, None, False, train=False),
        jax.random.PRNGKey(0),
        patches,
    )

    def count(tree):
        return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree))

    params = variables["params"]
    rows = sorted(
        ((name, count(sub)) for name, sub in params.items()),
        key=lambda kv: -kv[1],
    )
    width = max(len(n) for n, _ in rows) + 2
    print(f"model: SR={cfg.MODEL.SR} DETECTOR={cfg.MODEL.DETECTOR_TYPE} "
          f"SF={cfg.MODEL.SCALE_FACTOR} input {lr}x{lr} -> {args.hw}x{args.hw}")
    print(f"{'module'.ljust(width)}{'params':>14}")
    for name, n in rows:
        print(f"{name.ljust(width)}{n:>14,}")
    total = count(params)
    others = {k: count(v) for k, v in variables.items() if k != "params"}
    print("-" * (width + 14))
    print(f"{'TOTAL'.ljust(width)}{total:>14,}  "
          f"({total * 4 / 1e6:.1f} MB f32, {total * 2 / 1e6:.1f} MB bf16)")
    for k, n in others.items():
        print(f"  + {k}: {n:,}")


if __name__ == "__main__":
    main()
