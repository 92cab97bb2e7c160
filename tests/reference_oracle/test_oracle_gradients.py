"""Gradient-level oracle (VERDICT r4 #3d): d(total)/d(params) for a tiny
KBPN(2-stage)+PSPNet joint model against torch autograd on the REAL
reference `JointModelWithLoss` + trainer `calc_loss`.

Forward-only oracles cannot catch a vjp bug in our custom lowering paths
(banded SFT algebra, consumer-merged narrow convs, the s2d pseudo-LR
einsums): a transposed-conv layout error that preserves forwards but
corrupts gradients would pass every other test.  Here both sides run the
same eval-mode forward (running-stat BN, no dropout — so the comparison is
pure autograd, no stochasticity), build the composite objective at a
joint-phase iteration, and every per-leaf gradient must agree:
cosine >= 1-1e-9 and relative L2 error <= 1e-6 in f64.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()
shims.patch_extractors_no_imagenet()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.engine.losses_glue import build_loss_fn  # noqa: E402
from csbsr_tpu.engine.phase import compute_phase, phase_config_from_cfg  # noqa: E402
from csbsr_tpu.utils import translators  # noqa: E402
from csbsr_tpu.utils.torch_convert import export_params_to_torch_names  # noqa: E402

_SHARED = [
    "MODEL.SR", "KBPN", "MODEL.NUM_STAGES", 2, "MODEL.SR_SCRATCH", True,
    "MODEL.DETECTOR_TYPE", "PSPNet", "MODEL.SCALE_FACTOR", 4,
    "MODEL.NUM_CLASSES", 1, "MODEL.JOINT_LEARNING", True,
    "BLUR.KERNEL_SIZE", 7, "BLUR.KERNEL_SIZE_OUTPUT", 7,
    "SOLVER.SR_LOSS_FUNC", "KBPN", "SOLVER.SEG_LOSS_FUNC", "BoundaryCombo",
    "SOLVER.TASK_LOSS_WEIGHT", 0.6, "SOLVER.BATCH_SIZE", 2,
    "SOLVER.SR_PRETRAIN_ITER", (1, 50), "SOLVER.SEG_PRETRAIN_ITER", (50, 80),
    # the KBPN-INTERNAL windows default to [1,50001]/[50001,100000]
    # (`defaults.py:40-41`) — pin them below _IT so iteration 100 is the
    # true joint phase (predictor path, everything trainable) on BOTH sides
    "SOLVER.SR_SR_MODULE_PRETRAIN_ITER", (1, 50),
    "SOLVER.SR_KERNEL_MODULE_PRETRAIN_ITER", (50, 80),
]
_B, _K, _SF, _HLR = 2, 7, 4, 16
_IT = 100  # joint phase: every group trainable, predicted-kernel path
_ALPHA = 0.55


@pytest.mark.slow
def test_composite_gradients_match_torch_autograd():
    import types

    from model.engine.trainer import calc_loss
    from model.modeling.build_model import JointModelWithLoss
    from model.data.transforms.transforms import FactorResize

    from csbsr_tpu.models import model_from_cfg

    rs = np.random.RandomState(77)
    h = _HLR * _SF
    lr_np = rs.rand(_B, _HLR, _HLR, 3)
    hr_np = rs.rand(_B, h, h, 3)
    seg_np = (rs.rand(_B, h, h, 1) > 0.7).astype(np.float64)
    k_np = rs.rand(_B, _K, _K) + 0.1
    k_np /= k_np.sum(axis=(1, 2), keepdims=True)

    cfg = util.our_cfg(_SHARED)
    rcfg = util.ref_cfg(_SHARED)

    with util.x64():
        model = model_from_cfg(cfg, dtype=jnp.float64)
        lr = jnp.asarray(lr_np)
        hr = jnp.asarray(hr_np)
        kvec = jnp.asarray(k_np.reshape(_B, -1))
        variables = model.init(
            {"params": jax.random.PRNGKey(71),
             "dropout": jax.random.PRNGKey(72)},
            lr, kvec, False, sr_targets=hr, train=False)
        variables = util.promote_f64(variables)
        bstats = variables.get("batch_stats", {})

        loss_fn = build_loss_fn(cfg)
        pc = phase_config_from_cfg(cfg, 1000)
        phase = compute_phase(_IT, pc)
        phase["alpha"] = jnp.asarray(_ALPHA, jnp.float64)
        batch = {"lr": lr, "hr": hr, "seg": jnp.asarray(seg_np),
                 "kernel": jnp.asarray(k_np)}

        assert not bool(phase["use_gt_kernel"]), "iteration must be joint-phase"

        def _loss(params):
            outputs = model.apply(
                {"params": params, "batch_stats": bstats},
                lr, kvec, phase["use_gt_kernel"], sr_targets=hr, train=False)
            return loss_fn(outputs, batch, phase)["total"]

        total_ours, grads = jax.value_and_grad(_loss)(variables["params"])
        total_ours = float(total_ours)

        # ---- torch side: real JointModelWithLoss, loaded from our export
        module_translators = {
            "sr_model": translators.translate_kbpn,
            "segmentation_model": translators.translate_pspnet,
        }
        sd = {}
        for mod, translate in module_translators.items():
            for tree in (variables["params"][mod],
                         variables.get("batch_stats", {}).get(mod, {})):
                for k, v in export_params_to_torch_names(tree, translate).items():
                    sd[f"{mod}.{k}"] = torch.from_numpy(
                        np.asarray(v, dtype=np.float64).copy())

        ref = JointModelWithLoss(rcfg, num_train_ds=100, resume_iter=0,
                                 sr_transforms=FactorResize(_SF, "bicubic"))
        ref = ref.double().eval()
        ref.iter_cnt = False
        ref.ss_loss_fn.alpha = _ALPHA
        util.load_strict_no_unexpected(ref, sd)

        x_t = torch.from_numpy(lr_np.transpose(0, 3, 1, 2)).requires_grad_(False)
        hr_t = torch.from_numpy(hr_np.transpose(0, 3, 1, 2))
        seg_t = torch.from_numpy(seg_np.transpose(0, 3, 1, 2))
        k_t = torch.from_numpy(k_np.reshape(_B, 1, _K, _K))

        seg_loss, sr_loss, _, _, _ = ref(_IT, x_t, hr_t, seg_t, k_t)
        args = types.SimpleNamespace(wandb_flag=False)
        total_ref, _, _ = calc_loss(seg_loss, 0.0, sr_loss, 0.0, _IT, rcfg, args)
        ref.zero_grad()
        total_ref.backward()
        total_ref = float(total_ref)

        ref_grads = {n: (p.grad.detach().numpy() if p.grad is not None else None)
                     for n, p in ref.named_parameters()}

        # ---- compare: export OUR grads by the same translated names (the
        # exporter's layout permutations are linear, so they map gradients
        # exactly like weights)
        assert abs(total_ours - total_ref) < 1e-7, (total_ours, total_ref)

        bad, n_compared, n_nonzero = [], 0, 0
        for mod, translate in module_translators.items():
            ours_by_name = export_params_to_torch_names(grads[mod], translate)
            for name, g_ours in ours_by_name.items():
                full = f"{mod}.{name}"
                if full not in ref_grads:  # batch_stats exports have no grads
                    continue
                n_compared += 1
                g_ref = ref_grads[full]
                a = np.asarray(g_ours, np.float64).ravel()
                b = (np.zeros_like(a) if g_ref is None
                     else np.asarray(g_ref, np.float64).ravel())
                na, nb = np.linalg.norm(a), np.linalg.norm(b)
                if na == 0 and nb == 0:
                    continue
                n_nonzero += 1
                rel = np.linalg.norm(a - b) / max(na, nb)
                cos = float(np.dot(a, b) / (na * nb)) if na > 0 and nb > 0 else 0.0
                if rel > 1e-6 or cos < 1 - 1e-9:
                    bad.append((full, rel, cos))

    assert n_compared > 150, f"only {n_compared} grad leaves compared"
    assert n_nonzero > 100, f"only {n_nonzero} nonzero grad leaves"
    assert not bad, f"{len(bad)} gradient mismatches (worst 5): {sorted(bad, key=lambda t: -t[1])[:5]}"
