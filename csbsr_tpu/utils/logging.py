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

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
