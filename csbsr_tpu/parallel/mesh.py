"""Device mesh + sharding helpers.

The reference's only parallelism is single-process DataParallel + SyncBN
(`train.py:105-112`, SURVEY.md 2.9).  TPU-native replacement: one
`jax.sharding.Mesh` with a `data` axis; batches are sharded on it, the train
step is jitted over the mesh, and XLA inserts the psums (gradients AND
BatchNorm statistics - SyncBN's three implementations collapse into the
global-batch reductions the compiler emits automatically).

Patch parallelism at test time (SplitPatch, patch_sampler.py) is the same
axis: patches are batch.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if mesh_shape is None or (len(mesh_shape) == 1 and mesh_shape[0] == -1):
        mesh_shape = [len(devices)]
    shape = []
    remaining = len(devices)
    for s in mesh_shape:
        if s == -1:
            s = remaining
        shape.append(s)
        remaining //= max(s, 1)
    n = int(np.prod(shape))
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names[: len(shape)]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis on 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
