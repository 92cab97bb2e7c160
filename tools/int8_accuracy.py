"""Measure bf16-vs-int8 serving agreement for a checkpoint.

Runs the flagship (or a given config's) model twice on the same inputs -
once with the normal bf16 path, once with CSBSR_INT8_SERVE quantized convs
(calibrated on the same batch) - and reports SR PSNR between the two
outputs, kernel-prediction PSNR, and segmentation agreement (IoU of the
0.5-thresholded maps + max prob deviation).

Usage:
  python tools/int8_accuracy.py [--config_file CFG] [--ckpt DIR ITER]
                                [--batch 32] [--platform tpu]

Without --ckpt it uses random init - that still bounds the numeric error
of the quantized path, but accuracy statements for production serving
should be made on trained weights.
"""
import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(config_file=None, ckpt=None, batch=32, patch=56, cfg=None):
    """Run the bf16-vs-int8 agreement gate; returns the metrics dict.

    ckpt: (output_dir, iteration) of an orbax checkpoint tree, or None for
    random init.  Importable so the pytest gate can run it on a freshly
    trained checkpoint artifact (tests/test_int8_serve.py)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from csbsr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import csbsr_tpu.models.blocks as blocks_mod
    from __graft_entry__ import _flagship_cfg
    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.models import model_from_cfg

    class _A:
        pass

    args = _A()
    args.ckpt = ckpt
    if cfg is None:
        if config_file:
            cfg = get_cfg_defaults()
            cfg.merge_from_file(config_file)
        else:
            cfg = _flagship_cfg()
    model = model_from_cfg(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    patches = jnp.asarray(rng.rand(batch, patch, patch, 3).astype(np.float32))

    blocks_mod.INT8_SERVE = False
    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, None, False, train=False)
    )(jax.random.PRNGKey(0), patches)
    params = variables["params"]
    if args.ckpt:
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(args.ckpt[0], "checkpoints", str(int(args.ckpt[1])))
        )
        restored = ocp.StandardCheckpointer().restore(path)
        params = restored["params"]
        if restored.get("batch_stats"):
            variables = dict(variables, batch_stats=restored["batch_stats"])

    bstats = variables.get("batch_stats", {})

    def apply(v, **kw):
        return model.apply(v, patches, None, False, train=False, clip_sr=True, **kw)

    ref = jax.jit(lambda v: apply(v))({"params": params, "batch_stats": bstats})
    ref = jax.tree_util.tree_map(np.asarray, ref)

    blocks_mod.INT8_SERVE = True
    _, quant = jax.jit(lambda v: apply(v, mutable=["quant"]))(
        {"params": params, "batch_stats": bstats}
    )
    q = jax.jit(lambda v: apply(v))(
        {"params": params, "batch_stats": bstats, "quant": quant["quant"]}
    )
    q = jax.tree_util.tree_map(np.asarray, q)

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)

    sr_psnr = psnr(np.clip(ref["sr"], 0, 1), np.clip(q["sr"], 0, 1))
    seg_ref = ref["seg"] > 0.5
    seg_q = q["seg"] > 0.5
    inter = np.logical_and(seg_ref, seg_q).sum()
    union = np.logical_or(seg_ref, seg_q).sum()
    iou = float(inter / union) if union else 1.0
    seg_maxdev = float(np.abs(ref["seg"] - q["seg"]).max())
    out = {
        "sr_psnr_bf16_vs_int8": round(sr_psnr, 2),
        "seg_agreement_iou@0.5": round(iou, 4),
        "seg_max_prob_deviation": round(seg_maxdev, 4),
        "weights": "checkpoint" if args.ckpt else "random-init",
    }
    if ref.get("kernel") is not None:
        out["kernel_psnr"] = round(psnr(ref["kernel"], q["kernel"]), 2)
    blocks_mod.INT8_SERVE = False
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", default=None)
    ap.add_argument("--ckpt", nargs=2, metavar=("DIR", "ITER"), default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform

    print(run(config_file=args.config_file, ckpt=args.ckpt, batch=args.batch))


if __name__ == "__main__":
    main()
