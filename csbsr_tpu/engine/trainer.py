"""Training engine: host loop around the jitted, mesh-sharded train step.

Rebuild of `/root/reference/model/engine/trainer.py` (do_train/do_pretrain_sr).
Differences by design:
  - degradation (kernel synthesis + blur + bicubic /SF) is fused into the
    jitted step on device (cfg.TPU.DEGRADE_ON_DEVICE) instead of running in
    dataloader workers on CUDA (`crack_dataset.py:51-62`);
  - phases/alpha/beta are pure functions of the step counter (engine.phase);
  - DataParallel+SyncBN are replaced by sharding the batch over the mesh.
Checkpointing: orbax, `OUTPUT_DIR/checkpoints/<iteration>` with model,
optimizer and step (the reference writes iteration_<n>.pth pairs,
trainer.py:117-131).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blur import identity_kernels, degrade, make_kernel_sampler
from ..ops.resize import resize
from ..metrics.device_metrics import psnr, ssim, iou_thresholds, kernel_psnr
from ..parallel.mesh import make_mesh, shard_batch, batch_sharding
from .phase import phase_config_from_cfg, compute_phase
from .losses_glue import build_loss_fn
from .train_state import (
    TrainState,
    create_train_state,
    grad_group_ids,
    make_train_step,
)


def make_degrade_fn(cfg):
    """Device-side batch degradation: (hr, key) -> (lr, kernels)."""
    sf = int(cfg.MODEL.SCALE_FACTOR)
    ksize = int(cfg.BLUR.KERNEL_SIZE_OUTPUT)
    blur_flag = bool(cfg.BLUR.FLAG)
    method = cfg.SOLVER.DOWNSCALE_INTERPOLATION
    # BLUR.MODE dispatch (set_blur surface, `blur/blur.py:207-238`); the
    # shipped recipes keep the reference's hardcoded "gaus"
    sampler = make_kernel_sampler(
        mode=cfg.BLUR.MODE,
        size=ksize,
        sigma_range=tuple(cfg.BLUR.SIGMA_RANGE),
        sigma_range2=tuple(cfg.BLUR.SIGMA_RANGE2) or None,
        ratio_range=tuple(cfg.BLUR.RATIO_RANGE),
        isotropic=bool(cfg.BLUR.ISOTROPIC),
    )

    def fn(hr, key):
        b = hr.shape[0]
        if blur_flag:
            kernels = sampler(key, b)
        else:
            kernels = identity_kernels(b, ksize)
        blurred_lr = degrade(hr, kernels, sf, method)
        return blurred_lr, kernels

    return fn


def build_train_step(cfg, model, pc, group_ids):
    """Compose degradation + model step into one jitted function."""
    loss_fn = build_loss_fn(cfg)
    base_step = make_train_step(cfg, model, loss_fn, pc, group_ids)
    degrade_fn = make_degrade_fn(cfg)
    degrade_on_device = bool(cfg.TPU.DEGRADE_ON_DEVICE)

    def step(state, batch, key):
        if degrade_on_device and "lr" not in batch:
            dkey = jax.random.fold_in(key, 7)
            lr, kernels = degrade_fn(batch["hr"], dkey)
            batch = dict(batch, lr=lr, kernel=kernels)
        return base_step(state, batch, key)

    return step


def build_eval_step(cfg, model):
    """Jitted eval: forward (no dropout, running BN stats) + metrics.

    Mirrors the in-training eval loop (trainer.py:133-250): clipped SR
    PSNR/SSIM, kernel PSNR, IoU at 0.5.  In SR-pretrain mode
    (`DATASET.ONLY_IMAGES`) the model has no segmentation head
    (`outputs["seg"] is None`), so only SR metrics are computed — the
    reference's `do_pretrain_sr` eval contract (trainer.py:328-352:
    PSNR/SSIM on clipped SR + kernel PSNR, no IoU).  Kernel PSNR is only
    meaningful for kernel-predicting SR nets (KBPN); DBPN/SrcNetSR/bicubic
    return a zero kernel vector, which the reference never scores.
    """
    ksize = int(cfg.BLUR.KERNEL_SIZE_OUTPUT)
    sr_only = bool(cfg.DATASET.ONLY_IMAGES)
    has_kernel = cfg.MODEL.SR == "KBPN"
    # inverse mode SRs the 1-channel seg map; PSNR/SSIM against the RGB HR
    # are meaningless, same skip as the test harness (engine/inference.py:100)
    sr_metrics = not bool(cfg.MODEL.SR_SEG_INV) and cfg.MODEL.SCALE_FACTOR != 1

    def eval_step(state: TrainState, batch):
        kernel_vec = batch["kernel"].reshape(batch["kernel"].shape[0], -1)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["lr"], kernel_vec, False,
            sr_targets=batch.get("hr"), train=False, clip_sr=True,
        )
        sr = jnp.clip(outputs["sr"].astype(jnp.float32), 0.0, 1.0)
        hr = batch["hr"].astype(jnp.float32)
        m = {}
        if sr_metrics:
            m["psnr"] = psnr(sr, hr)
            m["ssim"] = ssim(sr, hr)
        if not sr_only and outputs["seg"] is not None:
            m["iou@0.5"] = iou_thresholds(
                outputs["seg"].astype(jnp.float32), batch["seg"].astype(jnp.float32),
                jnp.asarray([0.5], jnp.float32),
            )[:, 0]
        if has_kernel and sr_metrics:
            # kernel PSNR on clipped sum-1 kernels (trainer.py:154-158 semantics)
            kvec = outputs["kernel"].astype(jnp.float32)
            kvec = kvec / jnp.sum(kvec, axis=-1, keepdims=True)
            k2d = jnp.clip(kvec.reshape(-1, ksize, ksize, 1), 0.0, 1.0)
            kt = jnp.clip(batch["kernel"].astype(jnp.float32)[..., None], 0.0, 1.0)
            m["kernel_psnr"] = psnr(k2d, kt)
        return m, outputs

    return eval_step


def save_checkpoint(output_dir: str, state: TrainState, iteration: int):
    """Orbax save. The arrays go in as-is (no device_get): under multi-host
    and/or TPU.ZERO1 the leaves are global jax.Arrays sharded across
    processes, and orbax writes each shard from the process that owns it -
    so this MUST be called collectively from every process (do_train does)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, "checkpoints", str(iteration)))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": int(state.step),
        },
        force=True,
    )
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(output_dir: str, state: TrainState, iteration: int) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, "checkpoints", str(iteration)))
    # no device_get templates (the live state may be ZeRO-sharded across
    # processes, engine save path) and no sharding-metadata replay (the
    # checkpoint may come from a different topology): every host restores
    # plain np arrays and re-places them afterwards
    import numpy as onp

    live = {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": 0}
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=onp.ndarray), live)
    restored = ocp.PyTreeCheckpointer().restore(path, item=live,
                                                restore_args=restore_args)
    return state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jnp.asarray(restored["step"], jnp.int32),
    )


def do_train(
    cfg,
    model,
    train_loader,
    eval_batches=None,
    *,
    resume_iter: int = 0,
    log_step: int = 50,
    save_step: int = 2000,
    eval_step_every: int = 2000,
    num_train_ds: Optional[int] = None,
    mesh=None,
    debug: bool = False,
    wandb_flag: bool = False,
    wandb_project: str = "CSBSR-TPU",
    log_fn=print,
):
    """The hot loop (trainer.py:26-250)."""
    mesh = mesh or make_mesh(cfg.TPU.MESH_SHAPE, cfg.TPU.MESH_AXES)
    pc = phase_config_from_cfg(cfg, num_train_ds or len(train_loader))

    from ..utils.logging import MetricsLogger

    mlog = MetricsLogger(cfg.OUTPUT_DIR, wandb_flag=wandb_flag,
                         project=wandb_project, config=dict(cfg))

    # init from the first batch
    it_loader = iter(train_loader)
    first = next(it_loader)
    degrade_fn = jax.jit(make_degrade_fn(cfg))
    rng = jax.random.PRNGKey(cfg.SEED)
    lr0, k0 = degrade_fn(jnp.asarray(first["hr"]), rng)
    sample = dict(first, lr=lr0, kernel=k0)
    state = create_train_state(cfg, model, rng, sample, pc)

    # ImageNet backbones (construction-time downloads in the reference),
    # then released/pretrained SR weights (build_model.py:96-110) on top
    from ..utils.pretrained import (
        load_imagenet_backbones,
        load_pretrained_dsrl,
        load_pretrained_sr,
    )

    new_params, new_stats = load_imagenet_backbones(cfg, state.params, state.batch_stats, log_fn)
    state = state.replace(params=new_params, batch_stats=new_stats)
    if "sr_model" in state.params:
        new_params, new_stats = load_pretrained_sr(cfg, state.params, state.batch_stats, log_fn)
        state = state.replace(params=new_params, batch_stats=new_stats)
    new_params, new_stats = load_pretrained_dsrl(cfg, state.params, state.batch_stats, log_fn)
    state = state.replace(params=new_params, batch_stats=new_stats)

    if resume_iter:
        state = restore_checkpoint(cfg.OUTPUT_DIR, state, resume_iter)

    if jax.process_count() > 1:
        # multi-host: every process computed the same init (same seed); turn
        # the host-identical state into replicated global arrays over the
        # cross-host mesh (parallel/mesh.py, SURVEY.md 2.9)
        from ..parallel.mesh import replicate_state

        state = replicate_state(state, mesh)

    group_ids = grad_group_ids(state.params)
    step_jit_kwargs = {}
    if cfg.TPU.ZERO1:
        if cfg.TPU.ZERO1 not in ("opt", "full"):
            raise ValueError(
                f"TPU.ZERO1 must be '', 'opt' or 'full', got {cfg.TPU.ZERO1!r}")
        # ZeRO-1 ('opt') / FSDP ('full') placement over the data axis; pin
        # the step's state output to the same shardings so state-out feeds
        # state-in without a reshard or recompile (parallel/mesh.py).
        from ..parallel.mesh import replicated, zero1_shardings

        state_sh = zero1_shardings(state, mesh,
                                   params_too=cfg.TPU.ZERO1 == "full")
        state = jax.tree_util.tree_map(jax.device_put, state, state_sh)
        step_jit_kwargs["out_shardings"] = (state_sh, replicated(mesh))
    step_fn = jax.jit(build_train_step(cfg, model, pc, group_ids),
                      donate_argnums=(0,), **step_jit_kwargs)
    eval_fn = jax.jit(build_eval_step(cfg, model)) if eval_batches is not None else None

    logging = {"loss": 0.0, "seg_loss": 0.0, "sr_loss": 0.0}
    tic = time.time()
    iteration = resume_iter

    def _to_device(b):
        return shard_batch({k: jnp.asarray(v) for k, v in b.items()}, mesh)

    pending = None
    for batch, nxt_batch in _lookahead(_chain_first(first, it_loader)):
        iteration += 1
        key = jax.random.fold_in(rng, iteration)
        hb = pending if pending is not None else _to_device(batch)
        state, metrics = step_fn(state, hb, key)
        # one-ahead device transfer: ship iteration i+1's host batch
        # (~25 MB at flagship scale) WHILE the just-dispatched step
        # executes, instead of serially between this step's metrics sync
        # and the next dispatch - that serial gap made dress-rehearsal
        # steps 1.5-1.7 s against a 0.64 s device step (PERF.md round 5)
        pending = _to_device(nxt_batch) if nxt_batch is not None else None

        for k in ("loss", "seg_loss", "sr_loss"):
            logging[k] += float(metrics[k])
        if iteration % log_step == 0:
            n = log_step
            log_fn(
                f"===> Iter: {iteration:07d}, Cost: {time.time()-tic:.2f}s, "
                f"Loss: {logging['loss']/n:.6f}, Segment_Loss({cfg.SOLVER.SEG_LOSS_FUNC}): "
                f"{logging['seg_loss']/n:.6f}, SR_Loss({cfg.SOLVER.SR_LOSS_FUNC}): "
                f"{logging['sr_loss']/n:.6f}, alpha: {float(metrics['alpha']):.3f}"
            )
            mlog.log(
                {k: v / n for k, v in logging.items()} | {"alpha": float(metrics["alpha"])},
                step=iteration,
            )
            if mlog.wandb_run is not None:
                # wandb.watch(model, log='all') analog (trainer.py:52);
                # jsonl gets the aggregate row, wandb the per-tensor hists
                mlog.log_histograms(state.params, step=iteration)
            logging = {k: 0.0 for k in logging}
            tic = time.time()

        if save_step and iteration % save_step == 0 and not debug:
            # collective: every process writes its addressable shards
            path = save_checkpoint(cfg.OUTPUT_DIR, state, iteration)
            if jax.process_index() == 0:
                log_fn(f"=====> Save Checkpoint to {path}")

        if eval_fn is not None and eval_step_every and iteration % eval_step_every == 0:
            scores: Dict[str, list] = {}
            first_eval = True
            for eb in eval_batches:
                if "lr" not in eb:
                    # lazy, deterministic degradation (one batch in HBM at a
                    # time; same kernels at every eval step)
                    seed = int(eb.get("degrade_seed", 0))
                    lr_b, k_b = degrade_fn(jnp.asarray(eb["hr"]), jax.random.PRNGKey(seed))
                    eb = {"hr": eb["hr"], "seg": eb["seg"], "lr": lr_b, "kernel": k_b}
                if jax.process_count() > 1:
                    # eval batches are host-global; feed only the local block
                    # (shard_batch assembles the global array from shards)
                    per = eb["hr"].shape[0] // jax.process_count()
                    lo = jax.process_index() * per
                    eb = {k: v[lo : lo + per] for k, v in eb.items()}
                m, outputs = eval_fn(state, shard_batch({k: jnp.asarray(v) for k, v in eb.items()}, mesh))
                if jax.process_count() > 1:
                    # per-sample metric vectors are data-sharded; gather the
                    # full vectors to every host
                    from jax.experimental import multihost_utils

                    m = multihost_utils.process_allgather(m)
                for k, v in m.items():
                    scores.setdefault(k, []).append(np.asarray(v).reshape(-1))
                if first_eval and not debug and jax.process_count() == 1:
                    # sample dumps of the first eval batch (trainer.py:186-227)
                    from ..utils.save_output import save_img

                    pred_dir = os.path.join(cfg.OUTPUT_DIR, "pred")
                    n = min(4, eb["hr"].shape[0])
                    save_img(pred_dir, np.asarray(eb["lr"][:n]), [f"lr{iteration}_{i}.png" for i in range(n)])
                    save_img(pred_dir, np.clip(np.asarray(outputs["sr"][:n], np.float32), 0, 1),
                             [f"sr{iteration}_{i}.png" for i in range(n)])
                    save_img(pred_dir, np.asarray(eb["hr"][:n]), [f"hr{iteration}_{i}.png" for i in range(n)])
                    if outputs["seg"] is not None:
                        save_img(pred_dir, np.asarray(outputs["seg"][:n], np.float32),
                                 [f"seg{iteration}_{i}.png" for i in range(n)])
                    first_eval = False
            means = {k: float(np.concatenate(v).mean()) for k, v in scores.items()}
            log_fn(f"=====> Eval @ {iteration}: " + ", ".join(f"{k}={v:.4f}" for k, v in means.items()))
            mlog.log({f"eval/{k}": v for k, v in means.items()}, step=iteration)

    mlog.close()
    return state


def _chain_first(first, rest):
    yield first
    yield from rest


def _lookahead(gen):
    """Yield (item, next_item or None) pairs - the hot loop uses the
    lookahead to overlap the next batch's host->device transfer with the
    in-flight step."""
    gen = iter(gen)
    prev = next(gen)
    for nxt in gen:
        yield prev, nxt
        prev = nxt
    yield prev, None
