#!/usr/bin/env python
"""Microbenchmark of the k8s4 (de)conv gradient kernels (VERDICT r3 #3).

PERF.md round 3 names "transpose-pass kernel efficiency (~53-60 TF/s vs
120-165 TF/s for the individual forward convs)" as the second binding
constraint on training MFU.  This tool isolates exactly those kernels at
flagship shapes (KBPN back-projection: 64-channel k=8 s=4 p=2 conv 224->56
and deconv 56->224, the geometry of `models/blocks.py` Up/DownBlock) and
measures, per variant:

    fwd          the forward conv/deconv
    gx           grad wrt input  (the actual transpose-pass kernel)
    gw           grad wrt weights (the batch-reduction kernel)
    fwd+bwd      one fused vjp program (what the train step runs)

variants:
    native       lax.conv_general_dilated / transposed via lhs_dilation
                 (what the model uses since round 2 - PERF.md "do NOT
                 hand-lower convs without re-measuring")
    s2d          ops/s2d space-to-depth lowering (and ITS autodiff)

Timing uses a lax.scan-chained carry (identical rationale to bench.py:
`block_until_ready` alone under-reports on axon, and unchained iterations
can be deduped), best-of-2 windows.

Run on the bench chip:  python tools/transpose_bench.py [--batch 32]
                        [--iters 10] [--json out.json]

`--sweep` additionally pins the CAUSE of whatever ceiling the base run
shows: for channel widths C in {64, 128, 256} it measures the native
conv/deconv fwd and grad-wrt-input kernels AND a matched-contraction pure
matmul (the s2d algebra makes conv k8s4 at width C a
(B*56^2, 64C) x (64C, C) matmul - N=C output lanes on a 128-lane MXU).
If conv TF/s tracks the matmul roof at every width, XLA's conv kernels
are already at the matmul ceiling for these shapes and the gap is a
property of the architecture's base_filter=64, not of kernel scheduling.

Intrinsic FLOPs: 2*B*Hdense*Wdense*k^2*Cin*Cout where Hdense is the
high-resolution side of the op (224 for both directions), i.e. the same
multiply-adds whichever lowering executes them.
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hr", type=int, default=224)
    ap.add_argument("--chan", type=int, default=64)
    ap.add_argument("--json", default=None)
    ap.add_argument("--sweep", action="store_true",
                    help="channel-width sweep + matched matmul roofs")
    ap.add_argument("--widths", type=int, nargs="+", default=[64, 128, 256],
                    help="channel widths for --sweep")
    ap.add_argument("--s2d", action="store_true",
                    help="also bench the deprecated ops/s2d lowering rows "
                         "(each row is a fresh multi-minute remote compile; "
                         "the native-vs-matmul-roof question needs none of "
                         "them)")
    ap.add_argument("--skip-base", action="store_true",
                    help="skip the per-kernel base rows (each is a fresh "
                         "remote compile; --chain answers the close-out "
                         "question without them)")
    ap.add_argument("--chain", type=int, default=0, metavar="K",
                    help="overhead-free chained-pair rows: conv and deconv "
                         "compose shape-wise (HR->LR->HR), so K chained "
                         "pairs amortize the harness cost (perturb multiply "
                         "+ output sum, ~2.7 ms at B=32 - LARGER than the "
                         "kernels themselves, which is why the base rows "
                         "under-read) to zero. Reports per-kernel-pair "
                         "TF/s for fwd (deconv;conv), gx (deconv_gx;conv_gx) "
                         "and a chained square-matmul MXU roof.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from csbsr_tpu.ops.s2d import s2d_conv, s2d_deconv

    K, S, P = 8, 4, 2
    B, C = args.batch, args.chan
    HR, LR = args.hr, args.hr // S
    rng = np.random.RandomState(0)

    x_hr = jnp.asarray(rng.rand(B, HR, HR, C).astype(np.float32)).astype(jnp.bfloat16)
    x_lr = jnp.asarray(rng.rand(B, LR, LR, C).astype(np.float32)).astype(jnp.bfloat16)
    # cotangents as DATA (a constant `ones` cotangent invites compile-time
    # simplification): conv outputs the LR grid, deconv the HR grid
    dy_lr = jnp.asarray(rng.rand(B, LR, LR, C).astype(np.float32)).astype(jnp.bfloat16)
    dy_hr = jnp.asarray(rng.rand(B, HR, HR, C).astype(np.float32)).astype(jnp.bfloat16)
    w_conv = jnp.asarray((rng.rand(K, K, C, C) - 0.5).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    # flax transpose_kernel layout (k, k, O, I)
    w_deconv = jnp.asarray((rng.rand(K, K, C, C) - 0.5).astype(np.float32) * 0.05).astype(jnp.bfloat16)

    def native_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (S, S), [(P, P), (P, P)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def native_deconv(x, w):
        # ConvTranspose2d(k,s,p) == conv with lhs_dilation=s, padding k-1-p,
        # kernel flipped in space with (O,I) as HWIO's I,O - the exact form
        # flax ConvTranspose(transpose_kernel=True) lowers to.
        wf = jnp.flip(w, (0, 1)).transpose(0, 1, 3, 2)  # (k,k,I,O) flipped
        return jax.lax.conv_general_dilated(
            x, wf, (1, 1),
            [(K - 1 - P, K - 1 - P)] * 2,
            lhs_dilation=(S, S),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def s2d_conv_fn(x, w):
        return s2d_conv(x, w, S, P).astype(x.dtype)

    def s2d_deconv_fn(x, w):
        return s2d_deconv(x, w, S, P).astype(x.dtype)

    # intrinsic FLOPs of one op application (fwd); gx and gw each cost the
    # same multiply-add volume
    flops_one = 2.0 * B * HR * HR * (K / S) ** 2 * C * C  # = 2*B*56^2*64*64*4
    # careful: dense output positions = HR side at stride 1 of the dilated
    # view; per HR-output-pixel work is k^2/s^2 * Cin * Cout MACs summed
    # over the s^2 phases -> total = 2*B*HR^2*(K^2/S^2)*C^2
    flops_one = 2.0 * B * HR * HR * (K * K / (S * S)) * C * C

    def timed(fn, *inputs, n=args.iters):
        """Chained-carry timing: scan n iterations, each feeding a scalar
        derived from the previous output back into the input.

        The perturbation multiplier must be a GENUINE function of the carry:
        an earlier version used `1.0 + 0.0 * carry`, which the algebraic
        simplifier folds to 1.0, making the body loop-invariant — XLA then
        hoists the whole op out of the scan and the row times an empty loop
        (observed: s2d grad rows at 0.00 ms / 10000+ "TF/s").  `carry *
        1e-38` is runtime-zero in f32 (carry ~ 1e-30-scaled sums, so the
        product underflows and 1.0 + 0 == 1.0 exactly — the measured math is
        unperturbed) but compile-time opaque."""
        fn_j = jax.jit(fn)
        out0 = fn_j(*inputs)
        jax.block_until_ready(out0)

        # inputs are jit ARGUMENTS, not closure captures: captures bake
        # into the serialized HLO as constants, and a large input (the
        # matmul-roof operand) then blows the remote compiler's request
        # limit (HTTP 413 - the same trap PERF.md records for weights)
        @jax.jit
        def loop(*ins):
            def body(carry, _):
                scale = (1.0 + carry * jnp.float32(1e-38))
                outs = fn_j(*jax.tree_util.tree_map(
                    lambda a: a * scale.astype(a.dtype), ins))
                # consume EVERY output leaf: chaining through only one lets
                # XLA dead-code-eliminate the others inside the scan (the
                # same DCE trap bench.py's seg head hit, PERF.md round 3) -
                # fused vjp rows would silently time fwd-only
                tot = sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree_util.tree_leaves(outs))
                return tot * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        float(loop(*inputs))  # compile+warm (host READ: axon's
        best = np.inf  # block_until_ready returns before remote completion)
        for _ in range(2):
            t0 = time.perf_counter()
            float(loop(*inputs))
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    results = {}

    def report(name, fn, inputs, n_ops):
        dt = timed(fn, *inputs)
        tfs = flops_one * n_ops / dt / 1e12
        results[name] = {"ms": round(dt * 1e3, 3), "tf_s": round(tfs, 1)}
        print(f"{name:<28s} {dt*1e3:9.2f} ms   {tfs:7.1f} TF/s")

    # calibration: the per-iteration cost of the harness itself (input
    # perturbation multiply + output sum on the HR-sized tensor, ~0 FLOPs of
    # useful work) - subtract mentally from every row at the same shapes
    dt0 = timed(lambda a: a, x_hr)
    results["harness_overhead_hr"] = {"ms": round(dt0 * 1e3, 3)}
    print(f"{'harness_overhead (HR tensor)':<28s} {dt0*1e3:9.2f} ms")

    variants = [] if args.skip_base else [
        ("native", native_conv, native_deconv, w_conv, w_deconv)]
    if args.s2d:
        variants.append(("s2d", s2d_conv_fn, s2d_deconv_fn, w_conv, w_deconv))
    for tag, conv, deconv, wc, wd in variants:
        # parity guard: both lowerings must agree before their numbers mean
        # anything (f32 reference on first run only)
        report(f"{tag}/conv_fwd", conv, (x_hr, wc), 1)
        report(f"{tag}/deconv_fwd", deconv, (x_lr, wd), 1)

        def conv_gx(x, w, dy, f=conv):
            return jax.vjp(lambda x_: f(x_, w), x)[1](dy)[0]

        def conv_gw(x, w, dy, f=conv):
            return jax.vjp(lambda w_: f(x, w_), w)[1](dy)[0]

        def deconv_gx(x, w, dy, f=deconv):
            return jax.vjp(lambda x_: f(x_, w), x)[1](dy)[0]

        def deconv_gw(x, w, dy, f=deconv):
            return jax.vjp(lambda w_: f(x, w_), w)[1](dy)[0]

        report(f"{tag}/conv_gx", conv_gx, (x_hr, wc, dy_lr), 1)
        report(f"{tag}/conv_gw", conv_gw, (x_hr, wc, dy_lr), 1)
        report(f"{tag}/deconv_gx", deconv_gx, (x_lr, wd, dy_hr), 1)
        report(f"{tag}/deconv_gw", deconv_gw, (x_lr, wd, dy_hr), 1)

        def conv_vjp(x, w, dy, f=conv):
            out, pull = jax.vjp(f, x, w)
            gx, gw = pull(dy)
            return out, gx, gw

        def deconv_vjp(x, w, dy, f=deconv):
            out, pull = jax.vjp(f, x, w)
            gx, gw = pull(dy)
            return out, gx, gw

        report(f"{tag}/conv_fwd+bwd", conv_vjp, (x_hr, wc, dy_lr), 3)
        report(f"{tag}/deconv_fwd+bwd", deconv_vjp, (x_lr, wd, dy_hr), 3)

    if args.chain:
        # Overhead-free per-kernel rates. The base rows above time
        # (perturb-multiply + kernel + output-sum) per iteration; at C=64
        # the harness part (~2.7 ms at B=32) EXCEEDS the kernel (~0.3-1 ms),
        # so their TF/s under-read by 3-8x and subtraction is too noisy.
        # Fix: conv maps HR->LR and deconv LR->HR, so the PAIR composes to
        # a shape-preserving map that chains K times data-dependently inside
        # one scan body (no CSE - each stage's input differs; no DCE - the
        # final output is consumed; no per-stage perturbation needed), and
        # the single perturb+sum amortizes over 2K kernels. Same trick for
        # the transpose pass via jax.linear_transpose (which, unlike vjp,
        # never evaluates the primal). The matmul_pair row is the MATCHED
        # MXU roof: the s2d algebra makes conv k8s4 a (B*56^2,4096)x(4096,64)
        # contraction and its input-gradient the (.,64)x(64,4096) transpose
        # - K=64 on a 128x128 MXU is the same depth-starvation the gx
        # kernels face, so pairing down+up projections prices exactly the
        # fwd+gx contraction geometry. matmul_square is the absolute roof.
        KC = args.chain
        print(f"\n--- chained-pair rows (k={KC}, overhead-free) ---")
        flops_pair = 2.0 * flops_one

        def chain_report(name, pair_fn, x0, fl=None):
            def body_fn(x):
                for _ in range(KC):
                    x = pair_fn(x)
                return x

            dt = timed(body_fn, x0)
            tfs = (fl or flops_pair) * KC / dt / 1e12
            per_pair = dt * 1e3 / KC
            results[name] = {"ms_per_pair": round(per_pair, 3),
                             "tf_s": round(tfs, 1)}
            print(f"{name:<28s} {per_pair:9.3f} ms/pair {tfs:7.1f} TF/s")

        def fwd_pair(x):
            return native_conv(native_deconv(x, w_deconv), w_conv)

        deconv_t = jax.linear_transpose(
            lambda x_: native_deconv(x_, w_deconv), x_lr)
        conv_t = jax.linear_transpose(
            lambda x_: native_conv(x_, w_conv), x_hr)

        def gx_pair(d_hr):
            (d_lr,) = deconv_t(d_hr)
            (d_hr2,) = conv_t(d_lr)
            return d_hr2

        chain_report("chain/fwd(deconv;conv)", fwd_pair, x_lr)
        chain_report("chain/gx(deconv_gx;conv_gx)", gx_pair, dy_hr)

        def train_pair(x):
            # the full fwd+bwd the train step runs for this pair: 6 kernel
            # applications (2 fwd + 2 gx + 2 gw). Loss is 0.5*sum(y^2) so
            # the cotangent is the OUTPUT (data, not a constant-foldable
            # `ones`); gw leaves are consumed through a runtime-zero
            # epsilon (1e-38 underflow, same trick as `timed`); gx is
            # x-shaped and chains. Magnitudes may saturate in bf16 over
            # the chain - TPU flush behavior keeps timing unaffected.
            def loss_fn(x_, wd_, wc_):
                y = native_conv(native_deconv(x_, wd_), wc_)
                return 0.5 * jnp.sum(y.astype(jnp.float32) ** 2)

            gx, gwd, gwc = jax.grad(loss_fn, (0, 1, 2))(x, w_deconv, w_conv)
            eps = (jnp.sum(gwd.astype(jnp.float32))
                   + jnp.sum(gwc.astype(jnp.float32))) * jnp.float32(1e-38)
            return gx * (1.0 + eps).astype(gx.dtype)

        chain_report("chain/fwd+bwd(pair)", train_pair, x_lr,
                     fl=6.0 * flops_one)

        # fixed roof M (not B*56^2: at B=32 that is an 822 MB operand for
        # no extra signal - 16k rows already saturate the MXU's M tiling)
        M = 16384
        mx = jnp.asarray(rng.rand(M, 64 * C).astype(np.float32)).astype(jnp.bfloat16)
        w_dn = jnp.asarray(((rng.rand(64 * C, C) - 0.5) * 0.03)
                           .astype(np.float32)).astype(jnp.bfloat16)
        w_up = jnp.asarray(((rng.rand(C, 64 * C) - 0.5) * 0.2)
                           .astype(np.float32)).astype(jnp.bfloat16)

        def mm_pair(a):
            return (a @ w_dn) @ w_up

        chain_report("chain/matmul_pair(K4096;K64)", mm_pair, mx,
                     fl=2.0 * (2.0 * M * (64 * C) * C))

        sq = jnp.asarray(rng.rand(8192, 4096).astype(np.float32)).astype(jnp.bfloat16)
        w_sq = jnp.asarray(((rng.rand(4096, 4096) - 0.5) * 0.03)
                           .astype(np.float32)).astype(jnp.bfloat16)
        chain_report("chain/matmul_square", lambda a: a @ w_sq, sq,
                     fl=2.0 * 8192 * 4096 * 4096)

    if args.sweep:
        # Width sweep: same geometry, C in {64,128,256}, vs the matched
        # pure-matmul roof. flops scale as C^2; the matmul has the exact
        # contraction the s2d regrouping produces (K=64C, N=C).
        print("\n--- width sweep (native) + matmul roof ---")
        for Cs in args.widths:
            xs_hr = jnp.asarray(
                rng.rand(B, HR, HR, Cs).astype(np.float32)).astype(jnp.bfloat16)
            xs_lr = jnp.asarray(
                rng.rand(B, LR, LR, Cs).astype(np.float32)).astype(jnp.bfloat16)
            wc = jnp.asarray(
                (rng.rand(K, K, Cs, Cs) - 0.5).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)
            wd = jnp.asarray(
                (rng.rand(K, K, Cs, Cs) - 0.5).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)
            fl = 2.0 * B * HR * HR * (K * K / (S * S)) * Cs * Cs

            def rep(name, fn, inputs, n_ops, fl=fl):
                dt = timed(fn, *inputs)
                tfs = fl * n_ops / dt / 1e12
                results[name] = {"ms": round(dt * 1e3, 3), "tf_s": round(tfs, 1)}
                print(f"{name:<28s} {dt*1e3:9.2f} ms   {tfs:7.1f} TF/s")

            dys_lr = jnp.asarray(
                rng.rand(B, LR, LR, Cs).astype(np.float32)).astype(jnp.bfloat16)
            dys_hr = jnp.asarray(
                rng.rand(B, HR, HR, Cs).astype(np.float32)).astype(jnp.bfloat16)

            def cgx(x, w, dy):
                return jax.vjp(lambda x_: native_conv(x_, w), x)[1](dy)[0]

            def cgw(x, w, dy):
                return jax.vjp(lambda w_: native_conv(x, w_), w)[1](dy)[0]

            def dgx(x, w, dy):
                return jax.vjp(lambda x_: native_deconv(x_, w), x)[1](dy)[0]

            def dgw(x, w, dy):
                return jax.vjp(lambda w_: native_deconv(x, w_), w)[1](dy)[0]

            rep(f"C{Cs}/conv_fwd", native_conv, (xs_hr, wc), 1)
            rep(f"C{Cs}/conv_gx", cgx, (xs_hr, wc, dys_lr), 1)
            rep(f"C{Cs}/conv_gw", cgw, (xs_hr, wc, dys_lr), 1)
            rep(f"C{Cs}/deconv_fwd", native_deconv, (xs_lr, wd), 1)
            rep(f"C{Cs}/deconv_gx", dgx, (xs_lr, wd, dys_hr), 1)
            rep(f"C{Cs}/deconv_gw", dgw, (xs_lr, wd, dys_hr), 1)

            # matched matmul roof: (B*56^2, 64C) x (64C, C) == same FLOPs
            # as one conv application (2*B*56^2*64C*C = 2*B*224^2*4*C^2)
            m = jnp.asarray(
                rng.rand(B * LR * LR, 64 * Cs).astype(np.float32)
            ).astype(jnp.bfloat16)
            mw = jnp.asarray(
                (rng.rand(64 * Cs, Cs) - 0.5).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)
            rep(f"C{Cs}/matmul_roof", lambda a, b: a @ b, (m, mw), 1)
            # and the N=128-lane-filled variant of the SAME total FLOPs
            # (K halved, N doubled) - isolates the lane-fill effect
            m2 = m[:, : 32 * Cs]
            mw2 = jnp.asarray(
                (rng.rand(32 * Cs, 2 * Cs) - 0.5).astype(np.float32) * 0.05
            ).astype(jnp.bfloat16)
            rep(f"C{Cs}/matmul_2xlanes", lambda a, b: a @ b, (m2, mw2), 1)

    if args.s2d:
        # cross-lowering parity (bf16 tolerance)
        a = np.asarray(native_conv(x_hr, w_conv), np.float32)
        b = np.asarray(s2d_conv_fn(x_hr, w_conv), np.float32)
        print("conv parity maxdiff:", np.abs(a - b).max())
        a = np.asarray(native_deconv(x_lr, w_deconv), np.float32)
        b = np.asarray(s2d_deconv_fn(x_lr, w_deconv), np.float32)
        print("deconv parity maxdiff:", np.abs(a - b).max())

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
