#!/usr/bin/env python
"""Probe host (pinned_host) activation offload on the attached TPU.

VERDICT r2 named activation offload as an untried training-throughput
lever. Whether it can pay depends on two facts this script measures:

  1. does the platform support memory_kind='pinned_host' shardings inside
     jit at all (the axon remote platform may not), and
  2. the sustained device<->host bandwidth for activation-sized buffers.

The arithmetic it feeds (PERF.md round 3): the irreducible HBM residency
in the train step is ~10 per-stage HR h-buffers (B*224*224*128*2 bytes,
822 MB each at B=64). Offloading them costs ~N^2/2 fetches per forward
(each later stage consumes all earlier h's) => ~8 GB/step of PCIe traffic
at B=64. If measured bandwidth is ~10-30 GB/s that adds 0.3-0.8 s to a
1.2 s step - a net loss unless it unlocks no-remat (-9 TFLOP/step), which
needs ~9 GB freed at B=32, more than the h-buffers hold.

Usage: python tools/host_offload_probe.py [--mb 1024]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=1024)
    args = p.parse_args()

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    print(f"device: {dev}, platform {dev.platform}", flush=True)
    try:
        mems = {m.kind for m in dev.addressable_memories()}
    except Exception as e:
        mems = None
        print(f"addressable_memories() failed: {type(e).__name__}: {e}", flush=True)
    print(f"memory kinds: {mems}", flush=True)
    if not mems or "pinned_host" not in mems:
        print("RESULT: pinned_host memory space NOT exposed - offload unavailable", flush=True)
        return

    n = args.mb * 1024 * 1024 // 2  # bf16 elements
    x = jnp.zeros((n,), jnp.bfloat16)

    from jax.sharding import SingleDeviceSharding

    host_sh = SingleDeviceSharding(dev, memory_kind="pinned_host")
    dev_sh = SingleDeviceSharding(dev, memory_kind="device")

    # round-trip inside one jit region (how offload would actually run)
    @jax.jit
    def roundtrip(x, c):
        h = jax.device_put(x + c.astype(x.dtype), host_sh)
        back = jax.device_put(h, dev_sh)
        return back[0].astype(jnp.float32) + c

    try:
        c = roundtrip(x, jnp.float32(0.0))
        float(c)
    except Exception as e:
        print(f"RESULT: in-jit device_put to pinned_host FAILED: {type(e).__name__}: {e}",
              flush=True)
        return

    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        c = roundtrip(x, c)
    float(c)
    dt = time.perf_counter() - t0
    gb = args.mb / 1024 * 2 * reps  # down + up per rep
    print(f"RESULT: round-trip OK; effective bandwidth {gb / dt:.1f} GB/s "
          f"({args.mb} MB buffer, {reps} reps, {dt*1000/reps:.1f} ms/rep)", flush=True)


if __name__ == "__main__":
    main()
