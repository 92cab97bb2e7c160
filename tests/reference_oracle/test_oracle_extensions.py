"""Oracle parity for the pure-python extension surfaces (VERDICT r4 #3a/b):
pacnet PacConv2d / PacConvTranspose2d / PacPool2d and SwitchNorm2d.

Ground truth: the REAL modules from
`/root/reference/model/modeling/hrnet_ocr/extensions/{pacnet/pac.py,
switchablenorms/switchable_norm.py}` (pure torch autograd — their default
non-native code paths run on CPU once `torch._thnn` is shimmed, see
shims._fake_torch_thnn).  Our params are loaded into the torch modules with
hand-built layout maps (these modules sit outside any checkpoint path, so
there is no name translator to exercise) and forwards must agree in f64.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _f64(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float64).copy())


def test_pac_conv2d_matches_reference():
    from model.modeling.hrnet_ocr.extensions.pacnet.pac import PacConv2d as RefPac
    from csbsr_tpu.models.extensions import PacConv2d

    c, o, ks = 5, 4, 3
    rng = np.random.RandomState(31)
    x = rng.rand(2, 8, 8, c).astype(np.float64)
    guide = rng.rand(2, 8, 8, 3).astype(np.float64)

    with util.x64():
        model = PacConv2d(features=o, kernel_size=ks, dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(5), jnp.asarray(x), jnp.asarray(guide))
        v = util.promote_f64(v)
        ours = model.apply(v, jnp.asarray(x), jnp.asarray(guide))

        ref = RefPac(c, o, ks, stride=1, padding=(ks - 1) // 2, bias=False).double()
        # our kernel (ks,ks,in,out) -> torch weight (out,in,ks,ks)
        w = np.asarray(v["params"]["kernel"]).transpose(3, 2, 0, 1)
        util.load_strict_no_unexpected(ref, {"weight": _f64(w)})
        with torch.no_grad():
            ref_out = ref(_f64(x.transpose(0, 3, 1, 2)),
                          _f64(guide.transpose(0, 3, 1, 2)))
        diff = util.max_abs_diff(ref_out, ours)
    assert diff < 1e-12, f"PacConv2d mismatch: {diff}"


def test_pac_conv_transpose2d_matches_reference():
    from model.modeling.hrnet_ocr.extensions.pacnet.pac import (
        PacConvTranspose2d as RefPacT,
    )
    from csbsr_tpu.models.extensions import PacConvTranspose2d

    c, o, ks, s, p, op = 4, 3, 3, 2, 1, 1
    rng = np.random.RandomState(32)
    x = rng.rand(2, 6, 6, c).astype(np.float64)
    h_out = (6 - 1) * s - 2 * p + (ks - 1) + op + 1
    guide = rng.rand(2, h_out, h_out, 3).astype(np.float64)

    with util.x64():
        model = PacConvTranspose2d(features=o, kernel_size=ks, stride=s,
                                   padding=p, output_padding=op,
                                   dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(6), jnp.asarray(x), jnp.asarray(guide))
        v = util.promote_f64(v)
        ours = model.apply(v, jnp.asarray(x), jnp.asarray(guide))

        ref = RefPacT(c, o, ks, stride=s, padding=p, output_padding=op,
                      bias=True).double()
        # our kernel (ks,ks,in,out) -> torch transposed weight (in,out,ks,ks)
        w = np.asarray(v["params"]["kernel"]).transpose(2, 3, 0, 1)
        sd = {"weight": _f64(w), "bias": _f64(np.asarray(v["params"]["bias"]))}
        util.load_strict_no_unexpected(ref, sd)
        with torch.no_grad():
            ref_out = ref(_f64(x.transpose(0, 3, 1, 2)),
                          _f64(guide.transpose(0, 3, 1, 2)))
        assert ref_out.shape[-1] == h_out
        diff = util.max_abs_diff(ref_out, ours)
    assert diff < 1e-12, f"PacConvTranspose2d mismatch: {diff}"


@pytest.mark.parametrize("normalize", [True, False])
def test_pac_pool2d_matches_reference(normalize):
    from model.modeling.hrnet_ocr.extensions.pacnet.pac import PacPool2d as RefPool
    from csbsr_tpu.models.extensions import pac_pool2d

    rng = np.random.RandomState(33)
    x = rng.rand(2, 8, 8, 5).astype(np.float64)
    guide = rng.rand(2, 8, 8, 2).astype(np.float64)

    with util.x64():
        ours = pac_pool2d(jnp.asarray(x), jnp.asarray(guide), 3, stride=2,
                          padding=1, normalize_kernel=normalize)
        ref = RefPool(3, stride=2, padding=1, normalize_kernel=normalize).double()
        with torch.no_grad():
            ref_out = ref(_f64(x.transpose(0, 3, 1, 2)),
                          _f64(guide.transpose(0, 3, 1, 2)))
        diff = util.max_abs_diff(ref_out, ours)
    assert diff < 1e-12, f"PacPool2d (normalize={normalize}) mismatch: {diff}"


def test_frn_matches_reference():
    from model.modeling.hrnet_ocr.extensions.frn.frn import (
        FilterResponseNormalization as RefFRN,
    )
    from csbsr_tpu.models.extensions import FilterResponseNorm

    c = 5
    rng = np.random.RandomState(35)
    x = (rng.rand(2, 6, 6, c) * 2 - 0.5).astype(np.float64)

    with util.x64():
        model = FilterResponseNorm(dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(8), jnp.asarray(x))
        p = {k: np.asarray(a, np.float64) for k, a in v["params"].items()}
        p["gamma"] = p["gamma"] + rng.rand(c)
        p["beta"] = p["beta"] + rng.rand(c) - 0.5
        p["tau"] = p["tau"] + rng.rand(c) * 0.2
        v = {"params": jax.tree_util.tree_map(jnp.asarray, p)}
        ours = model.apply(v, jnp.asarray(x))

        ref = RefFRN(_f64(p["beta"].reshape(1, c, 1, 1)),
                     _f64(p["gamma"].reshape(1, c, 1, 1)),
                     _f64(p["tau"].reshape(1, c, 1, 1)))
        ref.eps = ref.eps.double()
        with torch.no_grad():
            ref_out = ref(_f64(x.transpose(0, 3, 1, 2)))
        diff = util.max_abs_diff(ref_out, ours)
    assert diff < 1e-12, f"FRN mismatch: {diff}"


def test_switch_norm2d_matches_reference():
    from model.modeling.hrnet_ocr.extensions.switchablenorms.switchable_norm import (
        SwitchNorm2d as RefSN,
    )
    from csbsr_tpu.models.extensions import SwitchNorm2d

    c = 6
    rng = np.random.RandomState(34)
    x = (rng.rand(3, 5, 7, c) * 4 - 1).astype(np.float64)

    with util.x64():
        model = SwitchNorm2d(dtype=jnp.float64)
        v = model.init(jax.random.PRNGKey(7), jnp.asarray(x))
        # non-trivial affine + softmax weights (init values are all-ones;
        # perturb so a transposed/misrouted load would actually fail)
        p = {k: np.asarray(a, np.float64) for k, a in v["params"].items()}
        p["weight"] = p["weight"] + rng.rand(c) * 0.5
        p["bias"] = p["bias"] + rng.rand(c) * 0.3 - 0.15
        p["mean_weight"] = p["mean_weight"] + rng.rand(3)
        p["var_weight"] = p["var_weight"] + rng.rand(3)
        v = {"params": jax.tree_util.tree_map(jnp.asarray, p)}
        ours = model.apply(v, jnp.asarray(x))

        ref = RefSN(c).double().train()  # batch-stat branch (our semantics)
        sd = {
            "weight": _f64(p["weight"].reshape(1, c, 1, 1)),
            "bias": _f64(p["bias"].reshape(1, c, 1, 1)),
            "mean_weight": _f64(p["mean_weight"]),
            "var_weight": _f64(p["var_weight"]),
            "running_mean": torch.zeros(1, c, 1, dtype=torch.float64),
            "running_var": torch.zeros(1, c, 1, dtype=torch.float64),
        }
        util.load_strict_no_unexpected(ref, sd)
        ref_out = ref(_f64(x.transpose(0, 3, 1, 2))).detach()
        diff = util.max_abs_diff(ref_out, ours)
    assert diff < 1e-12, f"SwitchNorm2d mismatch: {diff}"
