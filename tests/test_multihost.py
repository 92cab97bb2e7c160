"""Multi-host (DCN) scaffold tests.

The reference has no multi-node training at all (SURVEY.md 2.9); the
TPU-native story is jax.distributed + a cross-host mesh + per-process batch
feeding. test_two_process_train_step drives it for real: two OS processes
form a jax.distributed cluster over localhost (4 virtual CPU devices each),
each feeds its half of the global batch, and one sharded train step runs
over the 8-device cross-process mesh.
"""
import pytest
import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.quick
def test_loader_process_slicing():
    from csbsr_tpu.data import IterationBasedLoader

    class DS:
        def __len__(self):
            return 64

        def get(self, i, rng):
            return np.full((4, 4, 3), i, np.float32), np.zeros((4, 4, 1), np.float32)

    full = [b["hr"][:, 0, 0, 0] for b in IterationBasedLoader(DS(), 8, 3, seed=3, num_workers=1)]
    parts = []
    for pid in (0, 1):
        parts.append([
            b["hr"][:, 0, 0, 0]
            for b in IterationBasedLoader(
                DS(), 8, 3, seed=3, num_workers=1, process_id=pid, process_count=2
            )
        ])
    for it in range(3):
        assert parts[0][it].shape == (4,)
        # the two local halves concatenate to exactly the global batch
        np.testing.assert_array_equal(np.concatenate([parts[0][it], parts[1][it]]), full[it])


def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.json") for i in (0, 1)]
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "multihost_worker.py"),
             str(i), str(port), outs[i]],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(l[-3000:] for l in logs)
    results = [json.load(open(o)) for o in outs]
    assert all(r["devices"] == 8 for r in results)
    # the replicated loss must be identical on both controllers
    assert results[0]["loss"] == results[1]["loss"]
    assert np.isfinite(results[0]["loss"])
    # ZeRO/FSDP across processes computes the same step; the collective
    # orbax save + abstract-template restore round-trips inside the workers
    # (multihost_worker.py asserts bit-equality against the replicated state)
    assert abs(results[0]["loss_zero1"] - results[0]["loss"]) < 1e-5
    assert results[0]["loss_zero1"] == results[1]["loss_zero1"]
    assert os.path.isdir(str(tmp_path / "zero1_ckpt" / "checkpoints" / "1"))
