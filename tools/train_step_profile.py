#!/usr/bin/env python
"""Decompose the train-step time: what do the 680ms at B=32 consist of?

Times, at the flagship config (KBPN4+PSPNet, bf16+remat, B=32):
  fwd        : inference-mode forward (train=False, no grad)
  fwd_train  : forward with loss (train=True, no grad)
  step       : full train step (fwd + bwd + optimizer + BN updates)
  step_l1    : step with SR_LOSS_FUNC=L1 (drops the KBPN pseudo-LR loss)
  step_combo : step with SEG_LOSS_FUNC=Combo (drops the EDT/boundary term)
  step_nodeg : step with lr+kernel precomputed (no on-device degradation)

Usage: python tools/train_step_profile.py [--batch 32] [--which all]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _mk(cfg, batch, rng):
    import jax
    import jax.numpy as jnp

    from csbsr_tpu.engine import build_train_step, make_degrade_fn, phase_config_from_cfg
    from csbsr_tpu.engine.train_state import create_train_state, grad_group_ids
    from csbsr_tpu.models import model_from_cfg

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
    return model, state, step, batch_d, key


def time_step(step, state, batch, key, n=10):
    import jax

    state, m = step(state, batch, key)
    float(m["loss"])

    def run():
        nonlocal state
        t0 = time.perf_counter()
        mm = None
        for i in range(n):
            state, mm = step(state, batch, jax.random.fold_in(key, i))
        float(mm["loss"])
        return (time.perf_counter() - t0) / n * 1000

    return min(run(), run())


def time_fwd(model, state, batch, key, train, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(variables, lr, kvec, carry):
        out = model.apply(
            variables, lr + carry * jnp.float32(1e-12), kvec, False,
            train=False, clip_sr=True,
        )
        return carry + jnp.sum(out["sr"].astype(jnp.float32))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    kvec = batch["kernel"].reshape(batch["kernel"].shape[0], -1)
    carry = jnp.float32(0.0)
    carry = fwd(variables, batch["lr"], kvec, carry)
    float(carry)

    def run():
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(n):
            carry = fwd(variables, batch["lr"], kvec, carry)
        float(carry)
        return (time.perf_counter() - t0) / n * 1000

    return min(run(), run())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--which", type=str, default="fwd,step,step_l1,step_combo,step_nodeg")
    args = p.parse_args()

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _flagship_cfg

    rng = np.random.RandomState(0)
    b = args.batch
    res = {}
    for which in args.which.split(","):
        cfg = _flagship_cfg()
        cfg.TPU.REMAT = True
        if which == "step_l1":
            cfg.SOLVER.SR_LOSS_FUNC = "L1"
        if which == "step_combo":
            cfg.SOLVER.SEG_LOSS_FUNC = "Combo"
        model, state, step, batch_d, key = _mk(cfg, b, rng)
        try:
            if which == "fwd":
                ms = time_fwd(model, state, batch_d, key, train=False)
            elif which == "step_nodeg":
                ms = time_step(step, state, batch_d, key)  # lr+kernel present
            else:
                ms = time_step(step, state, {"hr": batch_d["hr"], "seg": batch_d["seg"]}, key)
            res[which] = round(ms, 1)
            print(f"{which:12s}: {ms:8.1f} ms  ({b / ms * 1000:.1f} img/s)", flush=True)
        except Exception as e:
            res[which] = f"FAIL {type(e).__name__}"
            print(f"{which}: FAILED {e}", flush=True)
    print(res)


if __name__ == "__main__":
    main()
