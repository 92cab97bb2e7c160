#!/usr/bin/env python
"""Interactive/deployment serving-shape latency probe (VERDICT r3 #5, r4 #1).

Two regimes the throughput bench (bench.py) does not cover:

1. small-batch latency: B in {1, 4, 8} 56x56 LR patches -> 224x224 SR+seg
   outputs, ms/batch and ms/image (the interactive regime).
2. full-image end-to-end: one HR-sized crack photo through the reference's
   actual deployment path (`/root/reference/model/engine/inference.py:80-90`):
   LR image -> SplitPatch(56) -> power-of-two-bucketed jitted model calls ->
   JointPatch -> (host) numpy outputs, host-inclusive wall time in ms/image.
   Image sizes: 448^2 and 896^2 HR (112^2 / 224^2 LR -> 4 / 16 patches).

Measurement integrity (PERF.md "Measurement integrity"): every call's input
is perturbed by a carry derived from the previous call's output, so no two
executions see identical inputs (the axon dedup trap) and the chain is a
real data dependency; each call is then synced individually
(block_until_ready on its outputs) because *latency* is per-call wall time,
not amortized throughput.

Run on the bench chip:  python tools/serve_latency.py [--json out.json]

Prints a small latency table and (optionally) writes machine-readable JSON;
PERF.md "Round 5" carries the recorded numbers.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="also write results as JSON")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _flagship_cfg
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.ops.patch import split_patch, joint_patch

    cfg = _flagship_cfg()
    model = model_from_cfg(cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    sf = int(cfg.MODEL.SCALE_FACTOR)
    ph = 56  # LR patch size (224 output / x4)

    init = jax.jit(lambda r, p: model.init({"params": r}, p, None, False, train=False))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((1, ph, ph, 3), jnp.float32))
    jax.block_until_ready(variables)

    @jax.jit
    def infer(variables, p, carry):
        # carry-perturbed input: each call executes on distinct data with a
        # chained dependency on the previous call (dedup-proof), at the cost
        # of one elementwise add
        out = model.apply(
            variables, p + carry * jnp.float32(1e-12), None, False,
            train=False, clip_sr=True,
        )
        return out["sr"], out["seg"], carry + jnp.sum(out["sr"].astype(jnp.float32))

    results = {}

    # ---- regime 1: small-batch latency ------------------------------------
    for b in (1, 4, 8):
        patches = jnp.asarray(rng.rand(b, ph, ph, 3).astype(np.float32))
        carry = jnp.float32(0.0)
        sr, seg, carry = infer(variables, patches, carry)  # compile + warm
        float(carry)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            sr, seg, carry = infer(variables, patches, carry)
            # per-call HOST READ of the carry: on axon, block_until_ready
            # returns before the remote execution completes (first run of
            # this tool read a physically impossible 0.57 ms at B=1 with
            # block_until_ready alone); only a value read is a true sync,
            # and a result read-back is part of real serving latency anyway
            float(carry)
            times.append(time.perf_counter() - t0)
        # median: single-call latency through a shared tunnel is spiky
        ms = float(np.median(times) * 1e3)
        results[f"latency_b{b}_ms"] = round(ms, 3)
        results[f"latency_b{b}_ms_per_image"] = round(ms / b, 3)
        print(f"B={b:<3d} 224x224 out: {ms:8.2f} ms/batch  {ms / b:8.2f} ms/image")

    # ---- regime 2: full image end-to-end (host-inclusive) -----------------
    def full_image(hr_size: int, u8: bool):
        lr_size = hr_size // sf
        img = rng.rand(lr_size, lr_size, 3).astype(np.float32)
        carry = jnp.float32(0.0)

        def run():
            nonlocal carry
            t0 = time.perf_counter()
            patches, ushape = split_patch(jnp.asarray(img), ph, ph)
            n = patches.shape[0]
            bucket = 1 << (n - 1).bit_length()
            if bucket != n:
                patches = jnp.concatenate(
                    [patches, jnp.zeros((bucket - n, ph, ph, 3), patches.dtype)]
                )
            sr_p, seg_p, carry = infer(variables, patches, carry)
            sr_p, seg_p = sr_p[:n], seg_p[:n]
            # SR reassembly: LR unfold shape with patch H/W scaled by SF
            # (mirrors `inference.py:89`); seg is single-channel, so its
            # unfold shape carries c = seg channels, not the image's 3
            # (mirrors the dataset-supplied seg_unfold_shape,
            # `/root/reference/model/data/crack_dataset.py:110-117`)
            sr_ushape = list(ushape)
            sr_ushape[5] *= sf
            sr_ushape[6] *= sf
            seg_ushape = list(sr_ushape)
            seg_ushape[4] = seg_p.shape[-1]
            sr_d = joint_patch(sr_p.astype(jnp.float32), sr_ushape)
            seg_d = joint_patch(seg_p.astype(jnp.float32), seg_ushape)
            if u8:
                # the shipped inference_tti path: SR crosses the tunnel
                # as uint8 (bit-identical to the PNG it becomes), seg as
                # f32 for exact float thresholding - 5.6 MB instead of
                # 12.8 MB at 896^2
                sr = np.asarray(
                    jnp.round(jnp.clip(sr_d, 0, 1) * 255.0).astype(jnp.uint8))
            else:
                sr = np.asarray(sr_d)
            seg = np.asarray(seg_d)
            dt = time.perf_counter() - t0
            assert sr.shape == (1, hr_size, hr_size, 3), sr.shape
            assert seg.shape == (1, hr_size, hr_size, 1), seg.shape
            return dt

        run()  # compile + warm (shared 224-out graph at the right bucket)
        times = [run() for _ in range(max(10, args.iters // 3))]
        ms = float(np.median(times) * 1e3)
        tag = "_u8" if u8 else ""
        results[f"full_image_{hr_size}{tag}_ms"] = round(ms, 3)
        n_patches = (lr_size // ph) ** 2
        print(f"full {hr_size}x{hr_size} HR{tag} ({n_patches} patches, host-inclusive): {ms:8.2f} ms/image")

    full_image(448, u8=False)
    full_image(896, u8=False)
    full_image(448, u8=True)
    full_image(896, u8=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
