#!/usr/bin/env python
"""CPU replay of the loss arithmetic on a nan_diag.py dump.

The dress-rehearsal NaN (round 5) appears in the LOSS FORWARD at an
iteration whose model outputs are all finite, so the loss stack can be
replayed term-by-term on CPU from the dumped outputs/batch to find the
eval-order position where the first non-finite value appears.

Usage: JAX_PLATFORMS=cpu python tools/nan_replay_cpu.py /tmp/nan_dump_603.npz
"""
from __future__ import annotations

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, ".")


def rep(name, arr):
    arr = np.asarray(arr).astype(np.float64)
    finite = np.isfinite(arr).all()
    print(f"{name:<34s} finite={str(bool(finite)):<5s} "
          f"min={np.nanmin(arr):+.4e} max={np.nanmax(arr):+.4e} "
          f"nan={int(np.isnan(arr).sum())} inf={int(np.isinf(arr).sum())}")
    return arr


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    dump = np.load(sys.argv[1] if len(sys.argv) > 1 else "/tmp/nan_dump_603.npz")
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 603

    import jax.numpy as jnp

    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.engine.losses_glue import build_loss_fn
    from csbsr_tpu.engine.phase import compute_phase, phase_config_from_cfg
    from csbsr_tpu.losses.seg_losses import (
        binary_dice,
        boundary_combo_loss,
        boundary_loss,
        weighted_bce,
    )

    cfg = get_cfg_defaults()
    cfg.merge_from_file("configs/dress_rehearsal.yaml")
    cfg.freeze()
    pc = phase_config_from_cfg(cfg, int(256 * cfg.SOLVER.TRAIN_DATASET_RATIO))
    phase = {k: np.asarray(v) for k, v in compute_phase(it, pc).items()}
    print("phase:", {k: v.tolist() for k, v in phase.items()})

    import ml_dtypes

    def load_arr(v):
        # np.savez round-trips bf16 as a void dtype; re-view it
        if v.dtype.kind == "V" and v.dtype.itemsize == 2:
            v = v.view(ml_dtypes.bfloat16)
        return jnp.asarray(v)

    outputs = {k[4:]: load_arr(v) for k, v in dump.items()
               if k.startswith("out_")}
    batch = {k[6:]: load_arr(v) for k, v in dump.items()
             if k.startswith("batch_")}
    for k, v in outputs.items():
        rep(f"out.{k}", v)
    for k, v in batch.items():
        rep(f"batch.{k}", v)

    f32 = jnp.float32
    alpha = jnp.asarray(phase["alpha"], f32)
    for head in ("seg", "aux"):
        p = outputs[head].astype(f32)
        t = batch["seg"].astype(f32)
        if p.shape != t.shape:
            t = jnp.broadcast_to(t, p.shape)
        rep(f"{head}: wbce", weighted_bce(p, t, tuple(cfg.SOLVER.BCELOSS_WEIGHT)))
        rep(f"{head}: dice", binary_dice(p, t))
        rep(f"{head}: boundary", boundary_loss(p, t))
        combo = boundary_combo_loss(
            p, t, alpha, tuple(cfg.SOLVER.BCELOSS_WEIGHT),
            tuple(cfg.SOLVER.WB_AND_D_WEIGHT))
        rep(f"{head}: combo", combo)

    # the full glue, exactly as the train step composes it
    loss_fn = build_loss_fn(cfg)
    losses = loss_fn(outputs, batch, compute_phase(it, pc))
    for k, v in losses.items():
        rep(f"glue.{k}", v)


if __name__ == "__main__":
    main()
