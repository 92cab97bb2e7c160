"""End-to-end train-step tests on the 8-device CPU mesh.

The TPU-native answer to the reference's untested multi-GPU path
(SURVEY.md 4): the full sharded train step (degradation + KBPN + PSPNet +
losses + masked grads) compiles and runs on a virtual data-parallel mesh,
and loss decreases on a tiny synthetic problem.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from csbsr_tpu.config import get_cfg_defaults
from csbsr_tpu.models import model_from_cfg
from csbsr_tpu.engine import (
    phase_config_from_cfg,
    compute_phase,
    build_train_step,
    build_eval_step,
    make_degrade_fn,
)
from csbsr_tpu.engine.train_state import create_train_state, grad_group_ids
from csbsr_tpu.parallel import make_mesh, shard_batch


def tiny_cfg(**overrides):
    cfg = get_cfg_defaults()
    cfg.MODEL.SR = "KBPN"
    cfg.MODEL.NUM_STAGES = 2
    cfg.MODEL.DETECTOR_TYPE = "u-net16"
    cfg.MODEL.UP_SAMPLE_METHOD = "deconv"
    cfg.SOLVER.SEG_LOSS_FUNC = "BoundaryCombo"
    cfg.SOLVER.SR_LOSS_FUNC = "KBPN"
    cfg.SOLVER.BATCH_SIZE = 8
    cfg.SOLVER.LR = 1e-4
    cfg.SOLVER.SR_PRETRAIN_ITER = [1, 5]
    cfg.SOLVER.SR_SR_MODULE_PRETRAIN_ITER = [1, 3]
    cfg.SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER = [3, 5]
    cfg.SOLVER.NORM_SR_OUTPUT = "instance"
    cfg.SOLVER.TASK_LOSS_WEIGHT = 0.3
    cfg.BLUR.KERNEL_SIZE = 7
    cfg.BLUR.KERNEL_SIZE_OUTPUT = 7
    cfg.INPUT.IMAGE_SIZE = [32, 32]
    cfg.TPU.COMPUTE_DTYPE = "float32"  # bf16 is emulated (slow) on CPU
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def make_batch(rng, b=8, hw=32):
    hr = rng.rand(b, hw, hw, 3).astype(np.float32)
    seg = (rng.rand(b, hw, hw, 1) > 0.8).astype(np.float32)
    return {"hr": jnp.asarray(hr), "seg": jnp.asarray(seg)}


def _setup(cfg, batch):
    model = model_from_cfg(cfg)
    pc = phase_config_from_cfg(cfg, 100)
    rng = jax.random.PRNGKey(0)
    lr, k = jax.jit(make_degrade_fn(cfg))(batch["hr"], rng)
    sample = dict(batch, lr=lr, kernel=k)
    state = create_train_state(cfg, model, rng, sample, pc)
    gids = grad_group_ids(state.params)
    step = jax.jit(build_train_step(cfg, model, pc, gids))
    return model, pc, state, step


@pytest.mark.quick
def test_phase_windows():
    cfg = tiny_cfg()
    pc = phase_config_from_cfg(cfg, 100)
    p1 = compute_phase(1, pc)
    assert bool(p1["use_gt_kernel"]) and bool(p1["in_sr_pretrain"])
    p3 = compute_phase(3, pc)
    assert not bool(p3["use_gt_kernel"]) and bool(p3["in_kernel_window"])
    p10 = compute_phase(10, pc)
    assert not bool(p10["in_sr_pretrain"]) and not bool(p10["in_kernel_window"])


@pytest.mark.quick
def test_train_step_runs_and_loss_decreases(rng):
    # empty pretrain windows: every iteration is the joint phase, so the
    # total loss is comparable across steps
    cfg = tiny_cfg(**{
        "SOLVER.SR_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_SR_MODULE_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER": [0, 0],
        "INPUT.IMAGE_SIZE": [16, 16],
    })
    batch = make_batch(rng, hw=16)
    model, pc, state, step = _setup(cfg, batch)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sb = shard_batch(batch, mesh)
    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(8):
        state, metrics = step(state, sb, jax.random.fold_in(key, 0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfitting one fixed batch (same rng => same degradation): loss drops
    assert losses[-1] < losses[0]


def test_zero1_state_sharding_matches_replicated(rng):
    """ZeRO-1/FSDP state placement (parallel/mesh.py zero1_shardings): the
    step runs with optimizer moments (and optionally params) sharded over
    the DP axis and produces the same numbers as the replicated layout."""
    from csbsr_tpu.parallel import replicate_state, shard_state_zero1

    cfg = tiny_cfg(**{
        "SOLVER.SR_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_SR_MODULE_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER": [0, 0],
        "INPUT.IMAGE_SIZE": [16, 16],
    })
    batch = make_batch(rng, hw=16)
    model, pc, state, step = _setup(cfg, batch)
    mesh = make_mesh()
    sb = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(11)

    s_rep = replicate_state(state, mesh)
    out_rep, m_rep = step(s_rep, sb, key)

    s_z1 = shard_state_zero1(state, mesh, min_size=64)
    dist = [l for l in jax.tree_util.tree_leaves(s_z1.opt_state)
            if hasattr(l, "sharding") and not l.sharding.is_fully_replicated]
    assert dist, "no optimizer leaf actually sharded"
    # a sharded leaf holds 1/8 of the array per device
    l0 = max(dist, key=lambda l: l.size)
    local = l0.addressable_shards[0].data.size
    assert local * mesh.devices.size == l0.size
    out_z1, m_z1 = step(s_z1, sb, key)
    assert abs(float(m_z1["loss"]) - float(m_rep["loss"])) < 1e-5

    s_z3 = shard_state_zero1(state, mesh, params_too=True, min_size=64)
    out_z3, m_z3 = step(s_z3, sb, key)
    assert abs(float(m_z3["loss"]) - float(m_rep["loss"])) < 1e-5
    pr = jax.device_get(out_rep.params)
    pz = jax.device_get(out_z3.params)
    for a, b in zip(jax.tree_util.tree_leaves(pr), jax.tree_util.tree_leaves(pz)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


@pytest.mark.quick
def test_leaf_shard_spec_placement_rules():
    """Weights shard only on their trailing output-feature dim (sharding a
    conv kernel's reduction dim while its activations are spatially sharded
    triggers a GSPMD partial-sum-conv miscompute - see mesh.py:_shard_dim);
    optimizer moments may use any divisible dim."""
    from jax.sharding import PartitionSpec as P

    from csbsr_tpu.parallel import make_mesh
    from csbsr_tpu.parallel.mesh import leaf_shard_spec

    mesh = make_mesh([4, 2], ("data", "spatial"))
    conv_oio = jnp.zeros((3, 3, 256, 256))   # HWIO, O divisible
    conv_odd = jnp.zeros((3, 3, 8, 49))      # only I divisible by 4
    bias = jnp.zeros((256,))

    # weights: trailing dim or nothing
    assert leaf_shard_spec(conv_oio, mesh, "data", 64, trailing_only=True) \
        == P(None, None, None, "data")
    assert leaf_shard_spec(conv_odd, mesh, "data", 64, trailing_only=True) == P()
    assert leaf_shard_spec(bias, mesh, "data", 64, trailing_only=True) == P("data")
    # moments: any divisible dim is fine (elementwise use), trailing preferred
    assert leaf_shard_spec(conv_odd, mesh, "data", 64) == P(None, None, "data", None)
    # small leaves replicate
    assert leaf_shard_spec(bias, mesh, "data", 16384) == P()


def test_zero1_on_2d_mesh_matches_replicated(rng):
    """ZeRO over 'data' on a 4x2 data x spatial mesh: FSDP weight gathers
    compose with the conv halo exchanges GSPMD inserts for the sharded
    image rows, and the numbers match the replicated placement."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from csbsr_tpu.parallel import make_mesh, replicate_state, shard_state_zero1

    cfg = tiny_cfg(**{
        "SOLVER.SR_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_SR_MODULE_PRETRAIN_ITER": [0, 0],
        "SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER": [0, 0],
        "INPUT.IMAGE_SIZE": [16, 16],
        "SOLVER.BATCH_SIZE": 4,
    })
    batch = make_batch(rng, b=4, hw=16)
    model, pc, state, step = _setup(cfg, batch)
    mesh = make_mesh([4, 2], ("data", "spatial"))
    sh2 = NamedSharding(mesh, P("data", "spatial"))
    sb = {k: jax.device_put(jnp.asarray(v), sh2) for k, v in batch.items()}
    key = jax.random.PRNGKey(5)

    _, m_rep = step(replicate_state(state, mesh), sb, key)
    _, m_z = step(shard_state_zero1(state, mesh, params_too=True, min_size=64),
                  sb, key)
    assert abs(float(m_z["loss"]) - float(m_rep["loss"])) < 1e-5


def test_grad_masks_freeze_sr_during_kernel_window(rng):
    cfg = tiny_cfg()
    batch = make_batch(rng)
    model, pc, state, step = _setup(cfg, batch)
    # jump into the kernel-pretrain window (iters 3..4)
    state = state.replace(step=jnp.asarray(2, jnp.int32))
    before = jax.device_get(state.params["sr_model"]["stage1_up"]["conv"]["conv"]["kernel"])
    before_k = jax.device_get(
        state.params["sr_model"]["predictor"]["feat_ext0"]["conv"]["kernel"]
    )
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = jax.device_get(state.params["sr_model"]["stage1_up"]["conv"]["conv"]["kernel"])
    after_k = jax.device_get(
        state.params["sr_model"]["predictor"]["feat_ext0"]["conv"]["kernel"]
    )
    np.testing.assert_array_equal(before, after)  # SR core frozen
    assert np.abs(after_k - before_k).max() > 0  # kernel predictor training


def test_eval_step(rng):
    cfg = tiny_cfg()
    batch = make_batch(rng)
    model, pc, state, step = _setup(cfg, batch)
    lr, k = jax.jit(make_degrade_fn(cfg))(batch["hr"], jax.random.PRNGKey(1))
    eval_fn = jax.jit(build_eval_step(cfg, model))
    m, outputs = eval_fn(state, dict(batch, lr=lr, kernel=k))
    assert m["psnr"].shape == (8,)
    assert np.isfinite(np.asarray(m["psnr"])).all()
    assert outputs["seg"].shape == (8, 32, 32, 1)


@pytest.mark.quick
def test_degrade_fn_blur_mode_dispatch(rng):
    """BLUR.MODE is honored inside the jitted degradation step
    (`set_blur` surface, reference `blur/blur.py:207-238`)."""
    batch = make_batch(rng, b=4)
    key = jax.random.PRNGKey(7)
    outs = {}
    for mode in ("gaus", "disk", "all_rand"):
        cfg = tiny_cfg(**{"BLUR.MODE": mode})
        lr, k = jax.jit(make_degrade_fn(cfg))(batch["hr"], key)
        assert lr.shape == (4, 8, 8, 3) and k.shape == (4, 7, 7)
        np.testing.assert_allclose(np.asarray(k).sum(axis=(1, 2)), 1.0, atol=1e-5)
        outs[mode] = np.asarray(k)
    assert not np.allclose(outs["gaus"], outs["disk"])
    assert not np.allclose(outs["gaus"], outs["all_rand"])
