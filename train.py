#!/usr/bin/env python
"""Train CLI.

Rebuild of `/root/reference/train.py`: seeds, YAML merge + freeze, dataset
split, loaders, model/optimizer, dispatch to do_train / SR pretraining.
Falls back to a synthetic crack dataset when the configured data dirs are
absent (so the pipeline runs anywhere).

Usage:
  python train.py --config_file configs/config_csbsr_pspnet.yaml [opts]
"""
from __future__ import annotations

import argparse
import os
import random
import shutil

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="CSBSR-TPU training")
    p.add_argument("--config_file", type=str, default="", metavar="FILE")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--log_step", type=int, default=50)
    p.add_argument("--save_step", type=int, default=2000)
    p.add_argument("--eval_step", type=int, default=2000)
    p.add_argument("--resume_iter", type=int, default=0)
    p.add_argument("--max_eval_batches", type=int, default=0,
                   help="cap eval batches (0 = full eval split, reference behavior)")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--synthetic", action="store_true", help="force synthetic data")
    # multi-host (DCN): initialise the jax distributed runtime before any
    # backend use; on Cloud TPU the coordinator/process args auto-detect
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize (multi-host DCN)")
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--wandb_flag", action="store_true", help="enable wandb logging")
    p.add_argument("--wandb_prj_name", type=str, default="CSBSR-TPU")
    # accepted for reference-CLI parity (train.py:122); the reference declares
    # it on the train CLI but only the inference path ever reads it
    p.add_argument("--output_dirname", type=str, default="")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p.parse_args()


def build_datasets(cfg, args):
    from csbsr_tpu.data import (
        CrackDataSet,
        MassRoadDataset,
        RetinalDataSet,
        SRPretrainDataSet,
        SyntheticCrackDataSet,
        TrainTransforms,
    )

    transforms = TrainTransforms(cfg)
    if not args.synthetic and os.path.isdir(cfg.DATASET.TRAIN_IMAGE_DIR):
        # domain dispatch (reference train.py:44-49 + ms_road analog)
        if cfg.DATASET.ONLY_IMAGES:
            ds = SRPretrainDataSet(cfg, cfg.DATASET.TRAIN_IMAGE_DIR, transforms)
        elif "RetinalSeg" in cfg.DATASET.TRAIN_IMAGE_DIR:
            ds = RetinalDataSet(
                cfg, cfg.DATASET.TRAIN_IMAGE_DIR, cfg.DATASET.TRAIN_MASK_DIR, transforms
            )
        elif "road" in cfg.DATASET.TRAIN_IMAGE_DIR.lower():
            ds = MassRoadDataset(
                cfg, cfg.DATASET.TRAIN_IMAGE_DIR, cfg.DATASET.TRAIN_MASK_DIR, transforms
            )
        else:
            ds = CrackDataSet(
                cfg, cfg.DATASET.TRAIN_IMAGE_DIR, cfg.DATASET.TRAIN_MASK_DIR, transforms
            )
        if len(ds) > 0:
            return ds
        print(f"No images found under {cfg.DATASET.TRAIN_IMAGE_DIR}; using synthetic data")
    else:
        print("Train data dir not found; using synthetic data")
    # pool scales with the batch so the 5% eval split always fills at least
    # one eval batch (256 fixed left `eval_batches` EMPTY at B=32: 13 < 32,
    # and the in-training eval silently printed nothing at dress scale)
    size = max(256, 21 * cfg.SOLVER.BATCH_SIZE)
    return SyntheticCrackDataSet(cfg, size=size, image_hw=cfg.INPUT.IMAGE_SIZE)


def main():
    args = parse_args()
    from csbsr_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # downsampled-dataset quirk (reference train.py:153-154): when the train
    # dir is a pre-downsampled "_ds_" set, the crop size shrinks by the scale
    # factor. The reference divides the raw IMAGE_SIZE value; since the config
    # schema carries [H, W] the division is elementwise here.
    if "_ds_" in cfg.DATASET.TRAIN_IMAGE_DIR:
        cfg.INPUT.IMAGE_SIZE = [
            int(s / cfg.MODEL.SCALE_FACTOR) for s in cfg.INPUT.IMAGE_SIZE
        ]
    cfg.freeze()

    np.random.seed(cfg.SEED)
    random.seed(cfg.SEED)

    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    if args.config_file:
        shutil.copy(args.config_file, os.path.join(cfg.OUTPUT_DIR, "config.yaml"))
    else:
        with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as f:
            f.write(cfg.dump())

    if args.distributed:
        from csbsr_tpu.parallel import init_distributed

        init_distributed(args.coordinator_address, args.num_processes, args.process_id)

    # persistent compile cache: without it every CLI invocation pays the full
    # remote compile of the train/eval graphs again (~7-15 min on axon)
    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from csbsr_tpu.data import IterationBasedLoader
    from csbsr_tpu.engine import do_train, make_degrade_fn
    from csbsr_tpu.models import model_from_cfg

    from csbsr_tpu.data import SubsetView

    dataset = build_datasets(cfg, args)
    # seeded random 95/5 split (reference random_split, train.py:52-57) so
    # eval samples never leak into the train stream
    n_train = int(len(dataset) * cfg.SOLVER.TRAIN_DATASET_RATIO)
    if "RetinalSeg" in cfg.DATASET.TRAIN_IMAGE_DIR:
        n_train = min(12, len(dataset))  # reference train.py:54-55 hardcodes 12/3
    perm = np.random.RandomState(cfg.SEED).permutation(len(dataset))
    train_ds = SubsetView(dataset, perm[:n_train])
    eval_idx = perm[n_train:]
    train_loader = IterationBasedLoader(
        train_ds, cfg.SOLVER.BATCH_SIZE, cfg.SOLVER.MAX_ITER - args.resume_iter,
        seed=cfg.SEED, start_iter=args.resume_iter, num_workers=args.num_workers,
        process_id=jax.process_index(), process_count=jax.process_count(),
    )

    # eval batches: the full eval split, kept as host numpy; degradation runs
    # lazily (deterministic per-batch key) inside the eval loop so HBM holds
    # only one eval batch at a time
    eval_batches = []
    rng = np.random.RandomState(cfg.SEED)
    if args.max_eval_batches:
        eval_idx = eval_idx[: args.max_eval_batches * cfg.SOLVER.BATCH_SIZE]
    for s in range(0, len(eval_idx) - cfg.SOLVER.BATCH_SIZE + 1, cfg.SOLVER.BATCH_SIZE):
        samples = [dataset.get(int(i), rng) for i in eval_idx[s : s + cfg.SOLVER.BATCH_SIZE]]
        eval_batches.append({
            "hr": np.stack([x[0] for x in samples]),
            "seg": np.stack([x[1] for x in samples]),
            "degrade_seed": cfg.SEED + s,
        })

    model = model_from_cfg(cfg)
    do_train(
        cfg, model, train_loader, eval_batches,
        resume_iter=args.resume_iter, log_step=args.log_step,
        save_step=args.save_step, eval_step_every=args.eval_step,
        num_train_ds=n_train, debug=args.debug,
        wandb_flag=args.wandb_flag, wandb_project=args.wandb_prj_name,
    )


if __name__ == "__main__":
    main()
