#!/usr/bin/env python
"""Whole-model inference roofline for the flagship forward (KBPN4+PSPNet).

Round-2 claimed "compute-bound at the reference architecture's intrinsic
FLOPs" from a single SFT ablation; this tool earns the claim properly
(VERDICT r2, Weak #5): it captures every top-level component call of the
real model (module class + the exact input shapes it sees at that stage),
microbenches each standalone at those shapes with the chained-carry
pattern, reads the executed FLOPs from the compiled executable, and prints

    component | ms | TFLOP | TF/s     (+ the Sigma-vs-full-model check)

If Sigma(component ms) ~= full-model ms, the model is the sum of its parts
and the per-class TF/s column IS the ceiling; a large gap would point at
inter-component fusion/layout problems worth kernel work.

Usage: python tools/inference_roofline.py [--batch 128]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# Top-level components of the flagship forward; nested whitelisted modules
# never occur (KBlock etc. contain only conv primitives).
WHITELIST = (
    "VGGFeat",
    "PredictorWithGAP",
    "KBPNUpBlock",
    "KBPNDownBlock",
    "KBlock",
    "SFTLayerKBPN",
    "ConcatConvBlock",
    "PSPNet",
)


def capture_calls(model, lr, kvec, whitelist=WHITELIST):
    """Trace model.init under eval_shape, recording (path, unbound module,
    abstract args) for every whitelisted top-level __call__."""
    import jax
    import flax.linen as nn

    records = []
    depth = [0]  # suppress nested whitelisted calls (defensive)

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        hit = (
            type(mod).__name__ in whitelist
            and context.method_name == "__call__"
            and depth[0] == 0
        )
        if hit:
            shapes = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
                if hasattr(a, "shape") and a.shape is not None
                else a,
                (args, kwargs),
            )
            records.append(("/".join(context.module.path), mod.clone(parent=None), shapes))
            depth[0] += 1
            try:
                return next_fun(*args, **kwargs)
            finally:
                depth[0] -= 1
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        jax.eval_shape(
            functools.partial(model.init, train=False, clip_sr=True),
            jax.random.PRNGKey(0), lr, kvec, False,
        )
    return records


def _zeros_like_spec(spec):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype) if isinstance(s, jax.ShapeDtypeStruct) else s,
        spec,
    )


def bench_block(mod, arg_spec, n=30):
    """Init + time one component standalone; returns (ms, flops)."""
    import jax
    import jax.numpy as jnp

    args, kwargs = _zeros_like_spec(arg_spec)
    # split array leaves (traced) from python leaves like `train` (STATIC -
    # tracing a bool breaks modules that branch on it, e.g. BatchNorm)
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    is_arr = [isinstance(l, jnp.ndarray) for l in leaves]
    arr_leaves = [l for l, m in zip(leaves, is_arr) if m]

    def rebuild(arrs):
        it = iter(arrs)
        merged = [next(it) if m else l for l, m in zip(leaves, is_arr)]
        return jax.tree_util.tree_unflatten(treedef, merged)

    # jit the init: an eager init executes the forward op-by-op over the
    # remote tunnel (each tiny op is its own dispatch/compile - minutes)
    def init_fn(key, arrs):
        a, kw = rebuild(arrs)
        return mod.init(key, *a, **kw)

    variables = jax.jit(init_fn)(jax.random.PRNGKey(0), arr_leaves)
    jax.block_until_ready(variables)

    @jax.jit
    def run(variables, arrs, carry):
        arrs = [arrs[0] + carry.astype(arrs[0].dtype) * jnp.asarray(1e-12, arrs[0].dtype)] + list(arrs[1:])
        a, kw = rebuild(arrs)
        out = mod.apply(variables, *a, **kw)
        leaves_out = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        return carry + sum(jnp.sum(x.astype(jnp.float32)) for x in leaves_out)

    flops = None
    try:
        flops = run.lower(variables, arr_leaves, jnp.float32(0.0)).compile().cost_analysis()["flops"]
    except Exception:
        pass
    carry = run(variables, arr_leaves, jnp.float32(0.0))
    float(carry)

    def timed():
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(n):
            carry = run(variables, arr_leaves, carry)
        float(carry)
        return (time.perf_counter() - t0) / n * 1000

    return min(timed(), timed()), flops


def bench_full(model, variables, lr, kvec, n=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(variables, lr, carry):
        out = model.apply(
            variables, lr + carry * jnp.float32(1e-12), kvec, False,
            train=False, clip_sr=True,
        )
        return carry + jnp.sum(out["sr"].astype(jnp.float32)) + jnp.sum(
            out["seg"].astype(jnp.float32)
        )

    flops = None
    try:
        flops = run.lower(variables, lr, jnp.float32(0.0)).compile().cost_analysis()["flops"]
    except Exception:
        pass
    carry = run(variables, lr, jnp.float32(0.0))
    float(carry)

    def timed():
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(n):
            carry = run(variables, lr, carry)
        float(carry)
        return (time.perf_counter() - t0) / n * 1000

    return min(timed(), timed()), flops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--skip_full", action="store_true")
    p.add_argument("--n", type=int, default=30, help="timed iterations per block")
    p.add_argument("--f32", action="store_true",
                   help="f32 compute (CPU validation; bf16 is emulated there)")
    p.add_argument("--whitelist", type=str, default=",".join(WHITELIST),
                   help="comma-separated module class names to capture "
                        "(e.g. KBlock internals: KernelPredictorLikeIKC)")
    args = p.parse_args()

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_cfg
    from csbsr_tpu.models import model_from_cfg

    cfg = _flagship_cfg()
    if args.f32:
        cfg.TPU.COMPUTE_DTYPE = "float32"
    model = model_from_cfg(cfg)
    rng = np.random.RandomState(0)
    b = args.batch
    lr = jnp.asarray(rng.rand(b, 56, 56, 3).astype(np.float32))
    kvec = None

    records = capture_calls(model, lr, kvec, tuple(args.whitelist.split(",")))
    print(f"captured {len(records)} component calls at B={b}:", flush=True)
    for path, mod, _ in records:
        print(f"  {path} ({type(mod).__name__})", flush=True)

    rows = []
    for path, mod, spec in records:
        try:
            ms, flops = bench_block(mod, spec, n=args.n)
        except Exception as e:
            print(f"{path}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        tf = flops / ms * 1e3 / 1e12 if flops else float("nan")
        rows.append((path, ms, (flops or 0) / 1e12, tf))
        print(f"{path:28s} {ms:8.2f} ms  {(flops or 0)/1e12:7.3f} TFLOP  {tf:7.1f} TF/s", flush=True)

    total_ms = sum(r[1] for r in rows)
    total_tf = sum(r[2] for r in rows)
    print(f"{'SUM(components)':28s} {total_ms:8.2f} ms  {total_tf:7.3f} TFLOP", flush=True)

    if not args.skip_full:
        variables = model.init(jax.random.PRNGKey(0), lr, kvec, False, train=False, clip_sr=True)
        ms, flops = bench_full(model, variables, lr, kvec, n=args.n)
        tf = flops / ms * 1e3 / 1e12 if flops else float("nan")
        print(
            f"{'FULL model':28s} {ms:8.2f} ms  {(flops or 0)/1e12:7.3f} TFLOP  {tf:7.1f} TF/s"
            f"  ({b / ms * 1000:.1f} img/s)",
            flush=True,
        )
        print(f"fusion gap: SUM {total_ms:.1f} ms vs FULL {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
