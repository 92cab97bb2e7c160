#!/usr/bin/env python
"""Convert a released reference checkpoint (iteration_N.pth) to orbax.

The reference saves `torch.save(model.state_dict())` of JointModelWithLoss
(`trainer.py:117-131`), i.e. keys `sr_model.*` + `segmentation_model.*`
(or `parallel_model.*` for DSRL), possibly `module.`-prefixed by
DataParallel (`misc.py:35-44`).  This tool maps every tensor through the
per-model name translators into the flax pytree and writes an orbax
checkpoint that `test.py <out_dir> <N>` consumes directly.

Usage:
  python tools/convert_released.py --config configs/config_csbsr_pspnet.yaml \
      --pth weights/iteration_250000.pth --out /tmp/csbsr_released [--iter 250000]

Then:
  python test.py --test_surface_distance /tmp/csbsr_released 250000 \
      DATASET.TEST_IMAGE_DIR ... DATASET.TEST_MASK_DIR ... DATASET.TEST_BLURED_DIR ...
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="recipe YAML (the training config)")
    p.add_argument("--pth", required=True, help="released iteration_N.pth")
    p.add_argument("--out", required=True, help="output test_dir for test.py")
    p.add_argument("--iter", type=int, default=0, help="iteration tag (default: parsed from filename)")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                   help="yacs KEY VALUE overrides (e.g. INPUT.IMAGE_SIZE [96,96])")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils.pretrained import convert_joint_checkpoint, load_torch_state_dict

    iteration = args.iter
    if not iteration:
        m = re.search(r"iteration_(\d+)", os.path.basename(args.pth))
        iteration = int(m.group(1)) if m else 0

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    model = model_from_cfg(cfg)
    ph, pw = [int(s / cfg.MODEL.SCALE_FACTOR) for s in cfg.INPUT.IMAGE_SIZE]
    variables = jax.jit(
        lambda r: model.init({"params": r}, jnp.zeros((1, ph, pw, 3)), None, False, train=False)
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    sd = load_torch_state_dict(args.pth)
    params, batch_stats = convert_joint_checkpoint(cfg, params, batch_stats, sd)

    out_ckpt = os.path.abspath(os.path.join(args.out, "checkpoints", str(iteration)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        out_ckpt,
        {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "step": iteration,
        },
        force=True,
    )
    ckptr.wait_until_finished()
    shutil.copy(args.config, os.path.join(args.out, "config.yaml"))
    print(f"converted {args.pth} -> {out_ckpt}")
    print(f"next: python test.py --test_surface_distance {args.out} {iteration} [DATASET.* overrides]")


if __name__ == "__main__":
    main()
