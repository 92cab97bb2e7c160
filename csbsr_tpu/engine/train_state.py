"""Train state, optimizer, gradient-group masks, and the jitted train step.

Replaces the reference's mutable-state machinery:
  - `requires_grad` flipping (`kbpn.py:118-155,414-447`, `trainer.py:468-530`,
    `build_model.py:352-368`) -> per-leaf *gradient group* ids with
    phase-dependent multipliers applied inside the step;
  - DataParallel + SyncBN (`train.py:105-112`) -> the batch axis is sharded
    over the mesh under jit; BatchNorm reductions become global psums
    automatically (SURVEY.md 2.9);
  - UpDownScheduler (`lr_scheduler.py:31-43`) -> optax scale-by-schedule.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from .phase import PhaseConfig, compute_phase

# gradient groups
SR_CORE, KERNEL, SEG, BLURSKIP = 0, 1, 2, 3


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def grad_group_ids(params) -> Any:
    """Assign each param leaf a gradient group (see module docstring).

    Groups mirror the reference's freeze sets:
      KERNEL   = KBPN predictor + per-stage kernel refiners
                 (kbpn.py:414-425 freeze set)
      SR_CORE  = the rest of sr_model (kbpn.py:124-142 freeze set)
      BLURSKIP = segmentation_model blur_skip ladder (build_model.py:352-368)
      SEG      = the rest of segmentation_model
    """
    flat = traverse_util.flatten_dict(params)
    groups = {}
    for path in flat:
        joined = "/".join(str(p) for p in path)
        if joined.startswith("sr_model"):
            if "predictor" in joined or "kernel_predictor" in joined:
                groups[path] = KERNEL
            else:
                groups[path] = SR_CORE
        elif joined.startswith("segmentation_model"):
            if "blur_skip" in joined:
                groups[path] = BLURSKIP
            else:
                groups[path] = SEG
        else:
            groups[path] = SR_CORE
    return traverse_util.unflatten_dict(groups)


def group_multipliers(phase: Dict, pc: PhaseConfig, *, blurskip_only: bool,
                      sr_seg_inv: bool) -> jnp.ndarray:
    """Phase-dependent 0/1 multiplier per gradient group (vector of 4)."""
    it = phase["iteration"]
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    if blurskip_only:
        # BlurSkip finetune: everything frozen but blur_skip
        return jnp.stack([zero, zero, zero, one])

    # KBPN internal freezes (kbpn.py:124-142,427-447)
    m_sr = jnp.where(phase["in_kernel_window"], zero, one)
    m_kernel = jnp.where(phase["use_gt_kernel"], zero, one)
    m_seg = one
    if not pc.joint_learning:
        # staged training (trainer.py:468-530): 2nd stage frozen during
        # pretrain, 1st stage frozen after
        after = it >= pc.sr_pretrain[1]
        if sr_seg_inv:
            # Reference parity: its inverse-staging branch is commented out
            # (trainer.py:487-492,527-530), so a non-joint SR_SEG_INV config
            # trains BOTH stages throughout. make_train_step logs an explicit
            # warning so this is never a silent surprise.
            pass
        else:
            m_seg = jnp.where(after, one, zero)
            m_sr = m_sr * jnp.where(after, zero, one)
            m_kernel = m_kernel * jnp.where(after, zero, one)
    return jnp.stack([m_sr, m_kernel, m_seg, jnp.float32(1.0)])


def make_optimizer(cfg, pc: PhaseConfig) -> optax.GradientTransformation:
    base_lr = float(cfg.SOLVER.LR)
    lr_steps = tuple(cfg.SOLVER.LR_STEPS)
    gamma = float(cfg.SOLVER.GAMMA)
    warmup_factor = float(cfg.SOLVER.WARMUP_FACTOR)
    warmup_iters = int(cfg.SOLVER.WARMUP_ITERS)

    def schedule(step):
        phase = compute_phase(step + 1, pc)
        lr = base_lr * phase["lr_mult"]
        if lr_steps:
            # WarmupMultiStepLR (lr_scheduler.py:14-29): linear warmup of
            # warmup_factor -> 1 over warmup_iters, then gamma decay at steps
            it = (step + 1).astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step + 1)
            alpha = jnp.clip(it / max(warmup_iters, 1), 0.0, 1.0)
            wf = warmup_factor * (1.0 - alpha) + alpha
            decays = sum(jnp.where(it >= m, 1, 0) for m in lr_steps)
            lr = lr * wf * gamma**decays
        return lr

    if cfg.MODEL.OPTIMIZER == "Adam":
        mu_dtype = jnp.dtype(cfg.TPU.OPT_MU_DTYPE)
        return optax.adam(schedule, mu_dtype=mu_dtype)
    if cfg.MODEL.OPTIMIZER == "SGD":
        return optax.sgd(schedule)
    raise NotImplementedError(cfg.MODEL.OPTIMIZER)


def create_train_state(cfg, model, rng, sample_batch, pc: PhaseConfig) -> TrainState:
    k2 = cfg.BLUR.KERNEL_SIZE_OUTPUT**2
    kernel_vec = sample_batch["kernel"].reshape(sample_batch["kernel"].shape[0], -1)

    # jit the init: eagerly it dispatches each op separately, which is very
    # slow over a remote-device transport.
    @jax.jit
    def _init(rng, lr, kvec, hr):
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            lr, kvec, False, sr_targets=hr, train=False,
        )

    variables = _init(rng, sample_batch["lr"], kernel_vec, sample_batch.get("hr"))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(cfg, pc)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_train_step(cfg, model, loss_fn, pc: PhaseConfig, group_ids):
    """Build the pure train step: (state, batch, rng) -> (state, metrics).

    The iteration counter is state.step + 1 (the reference enumerates its
    loader from resume_iter+1, trainer.py:57).
    """
    blurskip_only = cfg.MODEL.DETECTOR_TYPE in (
        "PSPNet_BlurSkip", "PSPNet_BlurSkip_origin", "PSPNet_BlurSkipReduct"
    )
    sr_seg_inv = bool(cfg.MODEL.SR_SEG_INV)
    if sr_seg_inv and not pc.joint_learning:
        import warnings

        warnings.warn(
            "MODEL.SR_SEG_INV with JOINT_LEARNING=False: the reference's "
            "inverse staged-freezing branch is disabled (trainer.py:487-492), "
            "so BOTH stages train for the full run. Matching that behavior.",
            stacklevel=2,
        )
    group_id_leaves = jax.tree_util.tree_map(lambda g: jnp.asarray(g), group_ids)

    def train_step(state: TrainState, batch, rng):
        it = state.step + 1
        phase = compute_phase(it, pc)
        kernel_vec = batch["kernel"].reshape(batch["kernel"].shape[0], -1)

        def _loss(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["lr"], kernel_vec, phase["use_gt_kernel"],
                sr_targets=batch.get("hr"), train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            losses = loss_fn(outputs, batch, phase)
            return losses["total"], (losses, mutated)

        grads, (losses, mutated) = jax.grad(_loss, has_aux=True)(state.params)
        mult = group_multipliers(phase, pc, blurskip_only=blurskip_only,
                                 sr_seg_inv=sr_seg_inv)
        grads = jax.tree_util.tree_map(
            lambda g, gid: g * mult[gid].astype(g.dtype), grads, group_id_leaves
        )
        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        # Also mask the updates: torch skips frozen params entirely
        # (grad=None), while Adam with a zero grad would still move params
        # from stale momentum.
        updates = jax.tree_util.tree_map(
            lambda u, gid: u * mult[gid].astype(u.dtype), updates, group_id_leaves
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=it,
            params=new_params,
            batch_stats=mutated["batch_stats"],
            opt_state=new_opt_state,
        )
        metrics = {
            "loss": losses["total"],
            "seg_loss": losses["seg_loss"],
            "sr_loss": losses["sr_loss"],
            "alpha": phase["alpha"],
        }
        return new_state, metrics

    return train_step
