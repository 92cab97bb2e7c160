#!/usr/bin/env python
"""One-command released-weights parity check.

Given a released checkpoint and the khanhha crack test data, converts the
.pth, runs the full AIU/PSNR/SSIM/HD harness, and compares against the
reference README's published row (README.md:83-91) within a tolerance
(BASELINE.json demands metrics within 0.5%).

Usage:
  python tools/parity_check.py --recipe csbsr_pspnet \
      --pth weights/CSBSR_pspnet_iteration_250000.pth \
      --image_dir datasets/crack_segmentation_dataset/test/images \
      --mask_dir  datasets/crack_segmentation_dataset/test/masks \
      --blur_dir  datasets/crack_segmentation_dataset/test_blured \
      [--blur_name 02_40] [--tolerance 0.005] [--skip_hd]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# README.md:85-91 (the released-model table; HD/MSD rows only when --skip_hd
# is not given). Keys match inference_for_ss summary keys.
EXPECTED = {
    "csbsr_pspnet": {"IoU_max": 0.573, "AIU": 0.552, "HD_min": 20.92, "AHD": 22.52, "PSNR": 28.75, "SSIM": 0.703},
    "csbsr_hrnet": {"IoU_max": 0.553, "AIU": 0.534, "HD_min": 17.54, "AHD": 20.29, "PSNR": 27.66, "SSIM": 0.668},
    "csbsr_crackformer": {"IoU_max": 0.469, "AIU": 0.443, "HD_min": 39.37, "AHD": 56.59, "PSNR": 25.93, "SSIM": 0.571},
    "csbsr_unet": {"IoU_max": 0.530, "AIU": 0.506, "HD_min": 26.33, "AHD": 27.24, "PSNR": 28.68, "SSIM": 0.702},
    "cssr_pspnet": {"IoU_max": 0.557, "AIU": 0.539, "HD_min": 21.20, "AHD": 24.74, "PSNR": 28.35, "SSIM": 0.656},
    "csbsr_pspnet_wf": {"IoU_max": 0.573, "AIU": 0.551, "HD_min": 18.73, "AHD": 21.7, "PSNR": 28.73, "SSIM": 0.702},
    "csbsr_pspnet_blurskip": {"IoU_max": 0.550, "AIU": 0.528, "HD_min": 18.06, "AHD": 19.1, "PSNR": 28.65, "SSIM": 0.702},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipe", required=True, choices=sorted(EXPECTED))
    p.add_argument("--pth", required=True)
    p.add_argument("--image_dir", required=True)
    p.add_argument("--mask_dir", required=True)
    p.add_argument("--blur_dir", required=True)
    p.add_argument("--blur_name", default="02_40")
    p.add_argument("--tolerance", type=float, default=0.005, help="relative tolerance")
    p.add_argument("--skip_hd", action="store_true", help="skip the (slow) surface-distance metrics")
    p.add_argument("--workdir", default="", help="reuse a conversion dir (default: temp)")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. 'cpu'); the axon TPU plugin "
                        "ignores JAX_PLATFORMS, only jax.config works")
    p.add_argument("opts", default=None, nargs="*",
                   help="yacs KEY VALUE overrides (e.g. INPUT.IMAGE_SIZE [96,96])")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tools.convert_released import main as _convert  # noqa: F401  (shared import path check)
    import subprocess

    workdir = args.workdir or tempfile.mkdtemp(prefix="csbsr_parity_")
    config = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "configs", f"config_{args.recipe}.yaml")
    ckpt = os.path.join(workdir, "checkpoints")
    if not os.path.isdir(ckpt):
        rc = subprocess.call([
            sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "convert_released.py"),
            "--config", config, "--pth", args.pth, "--out", workdir,
        ])
        if rc:
            sys.exit(rc)
    iteration = sorted(os.listdir(ckpt))[-1]

    import orbax.checkpoint as ocp
    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.data import CrackDataSetTest
    from csbsr_tpu.engine.inference import inference_for_ss
    from csbsr_tpu.models import model_from_cfg

    cfg = get_cfg_defaults()
    cfg.merge_from_file(config)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.DATASET.TEST_IMAGE_DIR = args.image_dir
    cfg.DATASET.TEST_MASK_DIR = args.mask_dir
    cfg.DATASET.TEST_BLURED_DIR = args.blur_dir
    cfg.DATASET.TEST_BLURED_NAME = args.blur_name
    out_dir = os.path.join(workdir, "eval", args.blur_name, f"iter_{iteration}")
    cfg.OUTPUT_DIR = out_dir
    cfg.freeze()

    model = model_from_cfg(cfg)
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(os.path.join(ckpt, iteration)))
    variables = {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}
    ds = CrackDataSetTest(cfg, args.image_dir, args.mask_dir, args.blur_dir, args.blur_name)
    assert len(ds) > 0, "Dataset size is 0!!"

    summary = inference_for_ss(
        cfg, model, variables, ds, output_dir=out_dir,
        test_aiu=True, test_surface_distance=not args.skip_hd, save_images=False,
    )

    expected = EXPECTED[args.recipe]
    rows, ok = [], True
    for key, want in expected.items():
        if key not in summary:
            continue
        got = summary[key]
        rel = abs(got - want) / max(abs(want), 1e-9)
        passed = rel <= args.tolerance
        ok &= passed
        rows.append({"metric": key, "expected": want, "got": round(got, 4),
                     "rel_err": round(rel, 5), "pass": passed})
    print(json.dumps({"recipe": args.recipe, "iteration": iteration,
                      "tolerance": args.tolerance, "rows": rows, "parity": ok}, indent=2))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
