"""Worker for the 2-process multi-host test (not a pytest module).

Usage: python tests/multihost_worker.py <process_id> <port> <out_json>

Forms a 2-process jax.distributed cluster over 127.0.0.1, 4 virtual CPU
devices per process (8 global), builds the cross-process data mesh, runs ONE
sharded train step on a tiny model with each process feeding only its local
half of the global batch, and writes the (replicated) loss to out_json.
"""
import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_json = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

import numpy as np
import jax.numpy as jnp

from csbsr_tpu.config import get_cfg_defaults
from csbsr_tpu.engine import build_train_step, make_degrade_fn, phase_config_from_cfg
from csbsr_tpu.engine.train_state import create_train_state, grad_group_ids
from csbsr_tpu.models import model_from_cfg
from csbsr_tpu.parallel import make_mesh, replicate_state, shard_batch
from csbsr_tpu.data import IterationBasedLoader

cfg = get_cfg_defaults()
cfg.MODEL.SR = "DBPN"
cfg.MODEL.NUM_STAGES = 2
cfg.MODEL.DETECTOR_TYPE = "u-net16"
cfg.SOLVER.SR_LOSS_FUNC = "L1"
cfg.SOLVER.SEG_LOSS_FUNC = "Dice"
cfg.SOLVER.BATCH_SIZE = 8
cfg.BLUR.KERNEL_SIZE = 7
cfg.BLUR.KERNEL_SIZE_OUTPUT = 7
cfg.INPUT.IMAGE_SIZE = [16, 16]
cfg.TPU.COMPUTE_DTYPE = "float32"
cfg.freeze()


# deterministic synthetic dataset; the loader slices the per-process block
class _DS:
    def __len__(self):
        return 32

    def get(self, i, rng):
        local = np.random.RandomState(1000 + i)
        hr = local.rand(16, 16, 3).astype(np.float32)
        seg = (local.rand(16, 16, 1) > 0.8).astype(np.float32)
        return hr, seg


loader = IterationBasedLoader(
    _DS(), cfg.SOLVER.BATCH_SIZE, 1, seed=7, num_workers=1,
    process_id=jax.process_index(), process_count=jax.process_count(),
)
local_batch = next(iter(loader))
assert local_batch["hr"].shape[0] == 4, local_batch["hr"].shape  # global 8 / 2

mesh = make_mesh()  # spans both processes
model = model_from_cfg(cfg)
pc = phase_config_from_cfg(cfg, 100)
rng = jax.random.PRNGKey(0)
lr, k = jax.jit(make_degrade_fn(cfg))(jnp.asarray(local_batch["hr"]), rng)
sample = dict(local_batch, lr=lr, kernel=k)
state = create_train_state(cfg, model, rng, sample, pc)
state = replicate_state(state, mesh)
gids = grad_group_ids(state.params)
step = jax.jit(build_train_step(cfg, model, pc, gids))

gbatch = shard_batch(local_batch, mesh)
assert gbatch["hr"].shape[0] == 8, gbatch["hr"].shape  # global batch
new_state, metrics = step(state, gbatch, rng)
loss = float(metrics["loss"])

# ZeRO/FSDP across the 2-process mesh: same step, params + moments sharded
# over 'data' (which here spans BOTH hosts), then a COLLECTIVE orbax save of
# the cross-process-sharded state (engine/trainer.py save_checkpoint).
from csbsr_tpu.engine.trainer import restore_checkpoint, save_checkpoint
from csbsr_tpu.parallel import shard_state_zero1

state_z = shard_state_zero1(state, mesh, params_too=True, min_size=64)
cross = [
    l for l in jax.tree_util.tree_leaves((state_z.params, state_z.opt_state))
    if hasattr(l, "sharding") and not l.sharding.is_fully_addressable
]
assert cross, "nothing sharded across processes"
_, metrics_z = step(state_z, gbatch, rng)
loss_z = float(metrics_z["loss"])
ckpt_dir = os.path.join(os.path.dirname(out_json), "zero1_ckpt")
save_checkpoint(ckpt_dir, state_z, 1)
# round trip on every host: abstract-template restore (no device_get on the
# cross-process-sharded live state).  state_z holds the same values as the
# replicated `state` (placement only), so the restored np leaves must match
# `state` bit-for-bit.
state_r = restore_checkpoint(ckpt_dir, state_z, 1)
for a, b in zip(jax.tree_util.tree_leaves(state_r.params),
                jax.tree_util.tree_leaves(state.params)):
    assert np.array_equal(np.asarray(a), np.asarray(b))

with open(out_json, "w") as f:
    json.dump({"pid": pid, "loss": loss, "loss_zero1": loss_z,
               "devices": jax.device_count()}, f)
print(f"worker {pid}: loss={loss} loss_zero1={loss_z}", flush=True)
jax.distributed.shutdown()
