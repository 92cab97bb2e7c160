#!/usr/bin/env python
"""Test CLI.

Rebuild of `/root/reference/test.py`: reconstructs the config from
`<test_dir>/config.yaml`, resolves the checkpoint by iteration number or
name, builds the inference model, dispatches to the AIU/PSNR/SSIM/HD
harness, the unlabeled TTI harness (`--tti_crack_dataset`,
test.py:59-60,78-79), or the retinal path ('RetinalSeg' in TEST_IMAGE_DIR,
test.py:61-64) with optional classification metrics
(`--test_classification_metrics`, test.py:96).

Usage:
  python test.py <test_dir> <iteration|weight_name> [--test_aiu] ...
"""
from __future__ import annotations

import argparse
import os


def parse_args():
    p = argparse.ArgumentParser(description="CSBSR-TPU evaluation")
    p.add_argument("test_dir", type=str)
    p.add_argument("trained_iter", type=str)
    p.add_argument("--output_dirname", type=str, default="")
    p.add_argument("--config_file", type=str, default="")
    p.add_argument("--test_aiu", action="store_true", default=True)
    p.add_argument("--no_test_aiu", dest="test_aiu", action="store_false")
    p.add_argument("--test_surface_distance", action="store_true")
    p.add_argument(
        "--surface_distance_host", action="store_true",
        help="score HD/MSD with the host (scipy/C++) oracle instead of the "
             "device-batched implementation",
    )
    p.add_argument("--test_classification_metrics", action="store_true")
    # reference polarity (test.py:97): images are saved BY DEFAULT; passing
    # the flag turns saving off.
    p.add_argument(
        "--sf_save_image", action="store_false", default=True,
        help="If you do not want the output images to be saved, pass this flag.",
    )
    p.add_argument("--tti_crack_dataset", action="store_true")
    p.add_argument(
        "--int8_serve", action="store_true",
        help="serve with int8 MXU convs (calibrated on the first test item; "
             "~1.2x throughput on v5e). Accuracy is checkpoint-dependent - "
             "validate with tools/int8_accuracy.py first.",
    )
    # the reference defaults wandb ON in test.py (`test.py:101`); this
    # environment has no network, so it is opt-in here - metrics.jsonl and
    # the plot pngs carry the same content either way
    p.add_argument("--wandb_flag", action="store_true")
    p.add_argument("--wandb_prj_name", type=str, default="CSBSR_test")
    p.add_argument("--test_blured_name", type=str, default="")
    # reference-parity knobs (test.py:91-92,98): batch_size bounds the
    # patches per device call; num_workers is accepted for CLI parity
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--origin_img_size", type=lambda s: s.lower() != "false", default=True)
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from csbsr_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg_path = args.config_file or os.path.join(args.test_dir, "config.yaml")
    if os.path.isfile(cfg_path):
        cfg.merge_from_file(cfg_path)
    if args.test_blured_name:
        cfg.DATASET.TEST_BLURED_NAME = args.test_blured_name
    if args.opts:
        cfg.merge_from_list(args.opts)

    # path conventions (reference test.py:105-126)
    if args.trained_iter.isdigit():
        ckpt_dir = os.path.join(args.test_dir, "checkpoints", args.trained_iter)
        tag = f"iter_{args.trained_iter}"
    else:
        ckpt_dir = os.path.join(args.test_dir, args.trained_iter)
        tag = args.trained_iter
    if args.tti_crack_dataset:
        # reference test.py:140-143: dedicated output dir + 64x64 patches
        output_dirname = args.output_dirname or os.path.join(
            args.test_dir, "eval", "tti_building", f"{tag}_size64"
        )
        cfg.INPUT.IMAGE_SIZE = [64, 64]
    else:
        output_dirname = args.output_dirname or os.path.join(
            args.test_dir, "eval", cfg.DATASET.TEST_BLURED_NAME, tag
        )
    if "RetinalSeg" in cfg.DATASET.TEST_IMAGE_DIR and args.origin_img_size:
        cfg.INPUT.IMAGE_SIZE = [560, 560]  # reference test.py:145-146
    cfg.OUTPUT_DIR = output_dirname
    cfg.freeze()

    # persistent compile cache: without it every CLI invocation pays the
    # full remote compile of the inference graphs again (minutes on axon)
    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import orbax.checkpoint as ocp
    from csbsr_tpu.data import CrackDataSetTest, RetinalDataSetTest, TTICrackDataSetTest
    from csbsr_tpu.engine.inference import inference_for_ss, inference_tti
    from csbsr_tpu.models import model_from_cfg

    model = model_from_cfg(cfg)
    # template-free restore of the saved pytree
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(ckpt_dir))
    variables = {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}

    if args.tti_crack_dataset:
        dataset = TTICrackDataSetTest(cfg, cfg.DATASET.TEST_IMAGE_DIR)
        assert len(dataset) > 0, "Dataset size is 0!!"
        if args.int8_serve:
            from csbsr_tpu.engine.inference import calibrate_int8

            variables = calibrate_int8(
                model, variables, dataset.get(0)[0][: args.batch_size]
            )
        inference_tti(cfg, model, variables, dataset, output_dir=output_dirname,
                      max_patches_per_call=args.batch_size)
        return

    ds_cls = (
        RetinalDataSetTest if "RetinalSeg" in cfg.DATASET.TEST_IMAGE_DIR else CrackDataSetTest
    )
    dataset = ds_cls(
        cfg,
        cfg.DATASET.TEST_IMAGE_DIR,
        cfg.DATASET.TEST_MASK_DIR,
        cfg.DATASET.TEST_BLURED_DIR,
        cfg.DATASET.TEST_BLURED_NAME,
    )
    assert len(dataset) > 0, "Dataset size is 0!!"

    if args.int8_serve:
        from csbsr_tpu.engine.inference import calibrate_int8

        variables = calibrate_int8(model, variables, dataset.get(0)[0])

    summary = inference_for_ss(
        cfg, model, variables, dataset,
        output_dir=output_dirname,
        test_aiu=args.test_aiu,
        test_surface_distance=args.test_surface_distance,
        surface_distance_device=not args.surface_distance_host,
        test_classification_metrics=args.test_classification_metrics,
        save_images=args.sf_save_image,
        wandb_flag=args.wandb_flag,
        wandb_project=args.wandb_prj_name,
    )
    print(summary)


if __name__ == "__main__":
    main()
