"""Metrics logging: JSONL file + console, optional wandb.

The reference logs to stdout + wandb throughout (`trainer.py:80-115`,
`inference.py:148-203`).  This environment has no network, so the primary
sink is OUTPUT_DIR/metrics.jsonl (one JSON object per log call); wandb is
used when importable AND explicitly enabled.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, wandb_flag: bool = False, project: str = "CSBSR-TPU", config=None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if wandb_flag:
            try:
                import wandb

                wandb.init(config=config, project=project)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    @property
    def wandb_run(self):
        """The live wandb module when logging is enabled, else None."""
        return self._wandb

    def log(self, metrics: Dict, step: Optional[int] = None):
        rec = {"ts": time.time(), **({"step": step} if step is not None else {}), **metrics}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_histograms(self, tree, step: Optional[int] = None, prefix: str = "params"):
        """`wandb.watch(model, log='all')` equivalent (reference trainer.py:52).

        Streams a per-tensor histogram of every leaf to wandb (when live)
        and appends one aggregate row (global min/max/mean/rms + leaf
        count) to metrics.jsonl.  Torch hooks grads on the host; here the
        gradient lives inside the compiled step, so the watched surface is
        the param/batch-stat tree - per-tensor gradient streaming would
        force an extra device->host copy of a full param-sized tree per
        log.  Callers pass any pytree of arrays.
        """
        import numpy as np
        import jax

        leaves = jax.tree_util.tree_leaves(tree)
        if not leaves:
            return
        host = [np.asarray(x).ravel() for x in leaves]
        flat = np.concatenate(host) if len(host) > 1 else host[0]
        self.log({f"{prefix}/min": float(flat.min()), f"{prefix}/max": float(flat.max()),
                  f"{prefix}/mean": float(flat.mean()),
                  f"{prefix}/rms": float(np.sqrt(np.mean(flat ** 2))),
                  f"{prefix}/num_tensors": len(leaves)}, step=step)
        if self._wandb is not None:
            from flax import traverse_util

            tree = tree if isinstance(tree, dict) else jax.tree_util.tree_map(lambda x: x, tree)
            flatd = traverse_util.flatten_dict(tree) if isinstance(tree, dict) else {
                (str(i),): l for i, l in enumerate(leaves)}
            hists = {f"{prefix}/{'/'.join(map(str, k))}":
                     self._wandb.Histogram(np_histogram=np.histogram(np.asarray(v).ravel(), bins=64))
                     for k, v in flatd.items()}
            self._wandb.log(hists, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
