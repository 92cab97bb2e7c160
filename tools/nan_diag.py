#!/usr/bin/env python
"""Replay train iterations from a checkpoint and locate non-finite values.

Built for the round-5 dress-rehearsal NaN (first non-finite loss at
iteration 604, i.e. the iteration-603 update poisoned the params: steps
601-603 log finite, decreasing losses, then everything is nan). Restores
the pre-NaN checkpoint, replays the SAME deterministic batches the real
loop drew (IterationBasedLoader start_iter + the do_train first-batch
chaining), and for each replayed step reports, per top-level param group:
how many gradient leaves are non-finite, plus the finiteness of every
loss term, model output, and mutated batch-stat.

Usage: python tools/nan_diag.py [--ckpt 600] [--steps 4]
                                [--out /tmp/dress_out] [--cfg CFG]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=int, default=600)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default="/tmp/dress_out")
    ap.add_argument("--cfg", default="configs/dress_rehearsal.yaml")
    ap.add_argument("--max_iter", type=int, default=700)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.data import IterationBasedLoader, SubsetView, SyntheticCrackDataSet
    from csbsr_tpu.engine.losses_glue import build_loss_fn
    from csbsr_tpu.engine.phase import compute_phase, phase_config_from_cfg
    from csbsr_tpu.engine.trainer import make_degrade_fn, restore_checkpoint
    from csbsr_tpu.engine.train_state import (
        create_train_state,
        grad_group_ids,
        group_multipliers,
    )
    from csbsr_tpu.models import model_from_cfg

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.cfg)
    cfg.merge_from_list(["SOLVER.MAX_ITER", str(args.max_iter),
                         "OUTPUT_DIR", args.out])
    cfg.freeze()

    # dataset + loader exactly as train.py builds them for --synthetic
    dataset = SyntheticCrackDataSet(cfg, size=256, image_hw=cfg.INPUT.IMAGE_SIZE)
    n_train = int(len(dataset) * cfg.SOLVER.TRAIN_DATASET_RATIO)
    perm = np.random.RandomState(cfg.SEED).permutation(len(dataset))
    train_ds = SubsetView(dataset, perm[:n_train])
    loader = IterationBasedLoader(
        train_ds, cfg.SOLVER.BATCH_SIZE, args.max_iter - args.ckpt,
        seed=cfg.SEED, start_iter=args.ckpt, num_workers=1,
    )
    it_loader = iter(loader)
    first = next(it_loader)

    model = model_from_cfg(cfg)
    pc = phase_config_from_cfg(cfg, n_train)
    rng = jax.random.PRNGKey(cfg.SEED)
    degrade_fn = make_degrade_fn(cfg)
    lr0, k0 = jax.jit(degrade_fn)(jnp.asarray(first["hr"]), rng)
    sample = dict(first, lr=lr0, kernel=k0)
    state = create_train_state(cfg, model, rng, sample, pc)
    state = restore_checkpoint(args.out, state, args.ckpt)

    loss_fn = build_loss_fn(cfg)
    group_ids = grad_group_ids(state.params)
    group_id_leaves = jax.tree_util.tree_map(lambda g: jnp.asarray(g), group_ids)
    blurskip_only = cfg.MODEL.DETECTOR_TYPE in (
        "PSPNet_BlurSkip", "PSPNet_BlurSkip_origin", "PSPNet_BlurSkipReduct")

    def finite_tree(t):
        return jax.tree_util.tree_map(
            lambda a: (jnp.all(jnp.isfinite(a)), jnp.max(jnp.abs(a))), t)

    def diag_step(state, batch, key):
        dkey = jax.random.fold_in(key, 7)
        lr, kernels = degrade_fn(batch["hr"], dkey)
        batch = dict(batch, lr=lr, kernel=kernels)
        it = state.step + 1
        phase = compute_phase(it, pc)
        kernel_vec = batch["kernel"].reshape(batch["kernel"].shape[0], -1)

        def _loss(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["lr"], kernel_vec, phase["use_gt_kernel"],
                sr_targets=batch.get("hr"), train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            losses = loss_fn(outputs, batch, phase)
            outs = {k: v for k, v in outputs.items()
                    if v is not None and hasattr(v, "dtype")}
            return losses["total"], (losses, mutated, outs)

        grads, (losses, mutated, outs) = jax.grad(_loss, has_aux=True)(state.params)
        mult = group_multipliers(phase, pc, blurskip_only=blurskip_only,
                                 sr_seg_inv=bool(cfg.MODEL.SR_SEG_INV))
        grads = jax.tree_util.tree_map(
            lambda g, gid: g * mult[gid].astype(g.dtype), grads, group_id_leaves)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(
            lambda u, gid: u * mult[gid].astype(u.dtype), updates, group_id_leaves)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=it, params=new_params,
                                  batch_stats=mutated["batch_stats"],
                                  opt_state=new_opt)
        report = {
            "losses": losses,
            "grads_f": finite_tree(grads),
            "outs_f": finite_tree(outs),
            "stats_f": finite_tree(mutated["batch_stats"]),
            "outs_raw": outs,
            "batch_raw": batch,
        }
        return new_state, report

    diag_jit = jax.jit(diag_step, donate_argnums=(0,))

    def path_str(p):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in p)

    for i in range(args.steps):
        batch = first if i == 0 else next(it_loader)
        iteration = args.ckpt + 1 + i
        key = jax.random.fold_in(rng, iteration)
        hb = {k: jnp.asarray(v) for k, v in batch.items()}
        state, report = diag_jit(state, hb, key)
        report = jax.device_get(report)
        if not np.isfinite(float(np.mean(np.asarray(report["losses"]["total"])))):
            # dump the (finite) forward outputs + batch of the first bad
            # iteration so the loss arithmetic can be replayed on CPU
            np.savez(f"/tmp/nan_dump_{iteration}.npz",
                     **{f"out_{k}": np.asarray(v)
                        for k, v in report["outs_raw"].items()},
                     **{f"batch_{k}": np.asarray(v)
                        for k, v in report["batch_raw"].items()})
            print(f"[dumped /tmp/nan_dump_{iteration}.npz]")
        print(f"--- iteration {iteration} ---")
        print("  losses:", {k: float(np.mean(np.asarray(v)))
                            for k, v in report["losses"].items()})
        for name in ("grads_f", "outs_f", "stats_f"):
            bad = []
            for p, (ok, mx) in jax.tree_util.tree_leaves_with_path(
                    report[name], is_leaf=lambda x: isinstance(x, tuple)
                    and len(x) == 2 and not isinstance(x[0], tuple)):
                if not bool(ok):
                    bad.append((path_str(p), float(mx)))
            if bad:
                print(f"  {name}: {len(bad)} NON-FINITE leaves; first 12:")
                for s, mx in bad[:12]:
                    print(f"    {s} (max|.|={mx:.3e})")
            else:
                # also show the largest magnitudes as an explosion early-warning
                mags = sorted(
                    ((float(mx), path_str(p)) for p, (ok, mx)
                     in jax.tree_util.tree_leaves_with_path(
                         report[name], is_leaf=lambda x: isinstance(x, tuple)
                         and len(x) == 2 and not isinstance(x[0], tuple))),
                    reverse=True)
                print(f"  {name}: all finite; top magnitudes:",
                      [(f"{m:.3e}", s) for m, s in mags[:3]])


if __name__ == "__main__":
    main()
