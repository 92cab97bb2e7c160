"""KBPN oracle: our flax KBPN + translate_kbpn vs the REAL reference
`model/modeling/kbpn.py` loaded from our exported weights.

Covers the flagship shape family (est=7 -> out=21 kernel upsampling, SFT
conditioning, IKC refinement) in both the predicted-kernel (joint phase)
and GT-kernel (SR-pretrain window) modes, plus the merged-narrow-conv vs
per-stage A/B on the reference oracle itself.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _build_pair(num_stages, est, out, monkeypatch=None, merged=None):
    """Construct (ref torch KBPN, our flax KBPN + variables) with our
    randomly-initialised weights loaded into the reference net."""
    from csbsr_tpu.models import kbpn as our_kbpn_mod
    from csbsr_tpu.utils import translators
    from csbsr_tpu.utils.torch_convert import export_params_to_torch_names

    if merged is not None:
        monkeypatch.setattr(our_kbpn_mod, "_MERGED_SR", merged)

    model = our_kbpn_mod.KBPN(
        scale_factor=4, num_stages=num_stages, estimate_ksize=est,
        ksize_output=out, dtype=jnp.float64,
    )
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float64)
    variables = model.init({"params": jax.random.PRNGKey(11)}, x0, None,
                           False, train=False)
    variables = util.promote_f64(variables)
    sd = {}
    for k, v in export_params_to_torch_names(
            variables["params"], translators.translate_kbpn).items():
        sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())

    ref_cfg = util.ref_cfg([
        "MODEL.SCALE_FACTOR", 4,
        "BLUR.KERNEL_SIZE", est,
        "BLUR.KERNEL_SIZE_OUTPUT", out,
    ])
    from model.modeling.kbpn import KBPN as RefKBPN

    ref_net = RefKBPN(ref_cfg, num_stages, 3).double().eval()
    util.load_strict_no_unexpected(ref_net, sd)
    return ref_net, model, variables


def _run_both(ref_net, model, variables, use_gt_kernel, out_ksize,
              sr_pretrain_iter):
    """Run the same input through both nets; return (sr diff, kernel diff)."""
    rs = np.random.RandomState(3)
    x = rs.rand(2, 3, 16, 16).astype(np.float64)
    if use_gt_kernel:
        k = rs.rand(2, out_ksize**2).astype(np.float64)
        k = k / k.sum(axis=1, keepdims=True)
        # joint phase iter inside the SR-pretrain window uses the GT kernel
        it = (sr_pretrain_iter[0] + sr_pretrain_iter[1]) // 2
        kernel_t = torch.from_numpy(k)
        kernel_j = jnp.asarray(k)
    else:
        it = 10**9  # far past every pretrain window -> predictor path
        kernel_t, kernel_j = None, jnp.zeros((2, out_ksize**2))

    with torch.no_grad():
        ref_sr, ref_kernel_map = ref_net(torch.from_numpy(x), it, kernel_t)
    # reference returns the kernel as a constant LR-sized map; GAP = vector
    ref_kernel_vec = ref_kernel_map.mean(dim=(2, 3)).numpy()

    sr, kernel_vec = model.apply(
        variables, util.nhwc(x), kernel_j, bool(use_gt_kernel), train=False)
    sr_diff = util.max_abs_diff(ref_sr, sr)
    k_diff = float(np.max(np.abs(ref_kernel_vec - np.asarray(kernel_vec))))
    return sr_diff, k_diff


@pytest.mark.parametrize("est,out", [(7, 7), (7, 21)])
def test_kbpn_forward_matches_reference(est, out):
    """Joint-phase forward (predictor + IKC refinement + SFT), 2 stages.
    est=7/out=21 is the released flagship kernel geometry
    (`config_csbsr_pspnet.yaml` BLUR.KERNEL_SIZE=7 + defaults.py:91)."""
    with util.x64():
        ref_net, model, variables = _build_pair(2, est, out)
        sr_pi = tuple(util.ref_cfg([]).SOLVER.SR_SR_MODULE_PRETRAIN_ITER)
        sr_diff, k_diff = _run_both(ref_net, model, variables, False, out, sr_pi)
    assert sr_diff < 1e-8, f"KBPN SR mismatch: {sr_diff}"
    assert k_diff < 1e-8, f"KBPN kernel mismatch: {k_diff}"


def test_kbpn_gt_kernel_window_matches_reference():
    """SR-pretrain window: GT kernel flows through, refiner skipped
    (`kbpn.py:89-93,386-388`)."""
    with util.x64():
        ref_net, model, variables = _build_pair(2, 7, 7)
        sr_pi = tuple(util.ref_cfg([]).SOLVER.SR_SR_MODULE_PRETRAIN_ITER)
        sr_diff, k_diff = _run_both(ref_net, model, variables, True, 7, sr_pi)
    assert sr_diff < 1e-8, f"KBPN SR mismatch (GT kernel): {sr_diff}"
    assert k_diff < 1e-8, f"KBPN kernel mismatch (GT kernel): {k_diff}"


@pytest.mark.slow
def test_kbpn_per_stage_form_matches_reference(monkeypatch):
    """CSBSR_MERGED_SR=0 path (per-stage narrow convs) against the same
    oracle — proves the A/B switch itself is reference-exact, 3 stages."""
    with util.x64():
        ref_net, model, variables = _build_pair(3, 7, 7, monkeypatch, merged=False)
        sr_pi = tuple(util.ref_cfg([]).SOLVER.SR_SR_MODULE_PRETRAIN_ITER)
        sr_diff, k_diff = _run_both(ref_net, model, variables, False, 7, sr_pi)
    assert sr_diff < 1e-8
    assert k_diff < 1e-8
