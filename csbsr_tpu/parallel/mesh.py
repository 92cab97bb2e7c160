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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization hook (SURVEY.md 2.9).

    The reference has no multi-node story at all (single-process
    DataParallel); the TPU-native design needs only this: after
    `jax.distributed.initialize`, `jax.devices()` is the global device set,
    the same `make_mesh` spans all hosts, and GSPMD routes the gradient/BN
    psums over ICI within a slice and DCN across slices. On Cloud TPU all
    three arguments are auto-detected from the environment; on CPU/GPU
    clusters pass them explicitly (tests drive a 2-process CPU cluster).
    Must be called before any other jax API touches a backend.
    """
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host batch -> batch-sharded global arrays.

    Single-process: a plain device_put. Multi-process: each host feeds ONLY
    its local shard of the global batch (the loader's process_id/
    process_count slicing) and the shards are assembled into one global
    jax.Array per leaf - the jax equivalent of a per-host distributed
    sampler feeding DistributedDataParallel.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            {k: np.asarray(v) for k, v in batch.items()}, mesh, P("data")
        )
    n = mesh.shape["data"]
    for k, v in batch.items():
        if hasattr(v, "shape") and v.ndim and v.shape[0] % n:
            raise ValueError(
                f"batch leaf '{k}' has leading dim {v.shape[0]}, not divisible "
                f"by the {n}-way 'data' mesh axis; raise SOLVER.BATCH_SIZE to a "
                f"multiple of the device count (or shrink the mesh)")
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def _shard_dim(shape, axis_size: int, trailing_only: bool) -> Optional[int]:
    """Pick the dim to shard: trailing dims first (output features).

    ``trailing_only`` restricts >=2-D arrays to their LAST dim.  That is the
    rule for live weights: sharding a conv kernel on a reduction dim (HWIO
    input channels) while the conv's activations are spatially sharded makes
    GSPMD emit a partial-sum convolution composed with halo exchanges, and on
    the CPU backend that combination miscomputes (~1e-3 relative error on a
    loss that is contractive to 1e-3 param noise - bisected to exactly
    {kernel sharded on I} x {inputs sharded on a spatial mesh axis}; sharding
    the same kernel on O, or dropping the spatial batch sharding, is
    bit-exact).  Output-feature sharding is also the idiomatic FSDP layout,
    so weights simply never shard on a contraction dim.  Optimizer moments
    are used only elementwise, so any divisible dim is safe for them.
    """
    dims = range(len(shape) - 1, -1, -1)
    if trailing_only and len(shape) >= 2:
        dims = (len(shape) - 1,)
    for d in dims:
        if shape[d] >= axis_size and shape[d] % axis_size == 0:
            return d
    return None


def leaf_shard_spec(x, mesh: Mesh, axis: str = "data", min_size: int = 16384,
                    trailing_only: bool = False) -> P:
    """PartitionSpec sharding one array's trailing axis-divisible dim on
    `axis`; small or indivisible leaves replicate.  ``trailing_only``: see
    `_shard_dim` (required for live weights, optional for moments)."""
    if not hasattr(x, "shape") or x.ndim == 0 or x.size < min_size:
        return P()
    d = _shard_dim(x.shape, mesh.shape[axis], trailing_only)
    if d is None:
        return P()
    spec = [None] * x.ndim
    spec[d] = axis
    return P(*spec)


def zero1_shardings(state, mesh: Mesh, axis: str = "data",
                    params_too: bool = False, min_size: int = 16384):
    """ZeRO-style sharding pytree for a train state, over the DP axis.

    The reference replicates everything per GPU (DataParallel); on TPU the
    optimizer moments are the cheapest memory to win back: Adam m/v are 2x
    the f32 params, and their update is elementwise, so sharding them over
    'data' costs nothing extra in communication beyond the gradient psum
    GSPMD already emits (= ZeRO-1).  With ``params_too`` the params shard
    the same way (ZeRO-3/FSDP flavor): XLA all-gathers each weight at its
    use sites, trading a per-layer all-gather for (N-1)/N of the weight
    memory - the lever that matters when remat is forced by HBM (PERF.md
    round-2 analysis).

    Everything else in the train state (step counters, phase scalars, BN
    stats) replicates.  Use the returned pytree both to ``device_put`` the
    state and as the train step's ``out_shardings`` so state-out matches
    state-in and the loop compiles once.

    Both params and moments use ``trailing_only`` placement (output-feature
    dim): weights MUST avoid contraction-dim sharding (see `_shard_dim`),
    and the moments mirror the param layout so the elementwise Adam update
    runs without any per-step resharding between g/m/v/p.
    """
    def spec_of(x):
        return NamedSharding(
            mesh, leaf_shard_spec(x, mesh, axis, min_size, trailing_only=True))

    repl = replicated(mesh)
    sh = jax.tree_util.tree_map(lambda _: repl, state)
    sh = sh.replace(opt_state=jax.tree_util.tree_map(spec_of, state.opt_state))
    if params_too:
        sh = sh.replace(params=jax.tree_util.tree_map(spec_of, state.params))
    return sh


def shard_state_zero1(state, mesh: Mesh, axis: str = "data",
                      params_too: bool = False, min_size: int = 16384):
    """Place a train state per `zero1_shardings` (see its docstring)."""
    sh = zero1_shardings(state, mesh, axis, params_too, min_size)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


def replicate_state(tree, mesh: Mesh):
    """Replicate a host-identical pytree (train state) over a possibly
    multi-host mesh. Each process must hold the same values (same seed =>
    same init), which is exactly the DDP broadcast contract."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        arrays = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
        return multihost_utils.host_local_array_to_global_array(arrays, mesh, P())
    return jax.device_put(tree, replicated(mesh))
