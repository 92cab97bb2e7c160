#!/usr/bin/env python
"""Sweep train-step variants on the real chip (VERDICT r2 item 2).

Variants: remat scope (full = remat Up/KB/Down; updown = keep KBlock
activations), batch size, Adam mu dtype.  Each timed like bench.py's
measure_train (chained state dependency, best of 2 runs of 10 steps).

Usage: python tools/train_perf_sweep.py [--variants v1,v2,...]
  variant syntax: B<batch>-<scope>[-mubf16][-segremat]
  e.g. B32-full, B64-updown-mubf16, B96-full-segremat
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

import numpy as np


def run_variant(batch: int, scope: str, mu_bf16: bool, seg_remat: bool = False) -> float:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from csbsr_tpu.engine import build_train_step, make_degrade_fn, phase_config_from_cfg
    from csbsr_tpu.engine.train_state import create_train_state, grad_group_ids
    from csbsr_tpu.models import model_from_cfg

    cfg = _flagship_cfg()
    cfg.TPU.REMAT = True
    cfg.TPU.REMAT_SCOPE = scope
    if mu_bf16:
        cfg.TPU.OPT_MU_DTYPE = "bfloat16"
    if seg_remat:
        cfg.TPU.REMAT_SEG = True

    rng = np.random.RandomState(0)
    model = model_from_cfg(cfg)
    key = jax.random.PRNGKey(0)
    hr = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))
    seg = jnp.asarray((rng.rand(batch, 224, 224, 1) > 0.9).astype(np.float32))
    lr, k = jax.jit(make_degrade_fn(cfg))(hr, key)
    batch_d = {"hr": hr, "seg": seg, "lr": lr, "kernel": k}
    pc = phase_config_from_cfg(cfg, 1000)
    state = create_train_state(cfg, model, key, batch_d, pc)
    gids = grad_group_ids(state.params)
    step = jax.jit(build_train_step(cfg, model, pc, gids), donate_argnums=(0,))

    train_batch = {"hr": hr, "seg": seg}
    t0 = time.perf_counter()
    state, m = step(state, train_batch, key)  # compile + warm
    float(m["loss"])
    print(f"  compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    def timed_run():
        nonlocal state
        n_iters = 10
        t0 = time.perf_counter()
        for i in range(n_iters):
            state, m = step(state, train_batch, jax.random.fold_in(key, i))
        float(m["loss"])
        return batch * n_iters / (time.perf_counter() - t0)

    return max(timed_run(), timed_run())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", type=str,
                   default="B32-full,B32-updown,B64-full,B64-updown")
    args = p.parse_args()

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    results = {}
    for v in args.variants.split(","):
        parts = v.strip().split("-")
        batch = int(parts[0][1:])
        scope = parts[1]
        mu_bf16 = "mubf16" in parts[2:]
        seg_remat = "segremat" in parts[2:]
        print(f"=== {v}: batch={batch} scope={scope} mu_bf16={mu_bf16} "
              f"seg_remat={seg_remat}", flush=True)
        try:
            img_s = run_variant(batch, scope, mu_bf16, seg_remat)
            results[v] = round(img_s, 2)
            print(f"  -> {img_s:.2f} img/s", flush=True)
        except Exception as e:
            results[v] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            traceback.print_exc()
            print(f"  -> FAILED", flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
