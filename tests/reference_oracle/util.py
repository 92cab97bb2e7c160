"""Shared plumbing for the reference-oracle tests.

Direction of proof: OUR randomly-initialized flax params are exported to a
torch state dict via `export_params_to_torch_names` + the per-model name
translators, loaded into the REAL reference net from /root/reference with
the reference's own strictness contract (unexpected_keys == 0,
`build_model.py:345-349`), and then both nets run the same input.  Agreeing
outputs prove the translators name every leaf correctly AND that the
architectures match layer-for-layer.
"""
from __future__ import annotations

import numpy as np

from . import shims

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.config import get_cfg_defaults  # noqa: E402
from csbsr_tpu.utils.torch_convert import export_params_to_torch_names  # noqa: E402


def our_cfg(shared_overrides, ours_only=()):
    cfg = get_cfg_defaults()
    cfg.merge_from_list(list(shared_overrides) + list(ours_only))
    return cfg


def ref_cfg(shared_overrides, ref_only=()):
    from model.config import cfg as _ref_base  # real reference defaults.py

    cfg = _ref_base.clone()
    cfg.merge_from_list(list(shared_overrides) + list(ref_only))
    return cfg


def init_model(cfg, lr_hw, seed=3, dtype=jnp.float32):
    """Build our CSBSRModel and init variables on CPU."""
    from csbsr_tpu.models import model_from_cfg

    model = model_from_cfg(cfg, dtype=dtype)
    x = jnp.zeros((1, lr_hw[0], lr_hw[1], 3))
    variables = model.init({"params": jax.random.PRNGKey(seed)}, x, None,
                           False, train=False)
    return model, variables


def export_module(variables, module_name, translate):
    """Export one top-level module's params+stats to torch names (float64)."""
    params = variables["params"].get(module_name, {})
    stats = variables.get("batch_stats", {}).get(module_name, {})
    sd = {}
    for tree in (params, stats):
        for k, v in export_params_to_torch_names(tree, translate).items():
            sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())
    return sd


def load_strict_no_unexpected(net, sd, allowed_missing=("num_batches_tracked",)):
    """The reference's own loading contract (`build_model.py:345-349`):
    strict=False but assert zero unexpected keys; missing keys may only be
    torch bookkeeping (num_batches_tracked) or aliases of shared modules
    (UNet16 registers the vgg encoder twice, `unet.py:143-176` -- loading
    either path fills the shared tensor)."""
    missing, unexpected = net.load_state_dict(sd, strict=False)
    assert len(unexpected) == 0, f"unexpected keys: {unexpected[:10]}"
    bad = [k for k in missing if not any(a in k for a in allowed_missing)]
    assert not bad, f"missing non-bookkeeping keys: {bad[:10]}"
    return net


def nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))


def to_np_nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def max_abs_diff(torch_out, ours_nhwc):
    a = torch_out.detach().numpy()
    b = to_np_nchw(ours_nhwc)
    assert a.shape == b.shape, f"shape mismatch: torch {a.shape} vs ours {b.shape}"
    return float(np.max(np.abs(a - b)))


def x64():
    """Context manager enabling 64-bit jax types (f64 parity runs)."""
    return jax.enable_x64(True)


def promote_f64(variables):
    """Promote every variable leaf (params AND batch_stats) to float64.

    flax's `_normalize` computes `mul = lax.rsqrt(var + epsilon)` in the
    running-stat dtype (normalization.py) — f32 by default — and only THEN
    multiplies into the f64 activations, injecting ~6e-8 relative error per
    eval-mode BatchNorm; torch's `.double()` nets compute the rsqrt in f64.
    Promoting the stats (values are exact f32→f64 promotions, so the
    exported torch state dict is unchanged) makes the comparison pure-f64
    on both sides.  Root-caused via a 1-ulp input-perturbation probe:
    model chaos amplification is ≤4e-13, so the observed 1e-7..5e-6
    BN-count-proportional diffs had to be a precision leak, not noise.
    """
    return jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), variables)
