"""PSPNet / PSPNet_BlurSkip oracles against the REAL reference modules
(`model/modeling/pspnet_pytorch/pspnet.py`, `extractors.py`).

The reference constructs with pretrained=True (model_zoo download);
`shims.patch_extractors_no_imagenet` no-ops the download — every weight is
overwritten by our exported state dict anyway.
"""
import numpy as np
import pytest

from . import shims, util

shims.install()
shims.patch_extractors_no_imagenet()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from csbsr_tpu.utils import translators  # noqa: E402
from csbsr_tpu.utils.torch_convert import export_params_to_torch_names  # noqa: E402


def _export_f64(variables, translate):
    sd = {}
    for tree in (variables["params"], variables.get("batch_stats", {})):
        for k, v in export_params_to_torch_names(tree, translate).items():
            sd[k] = torch.from_numpy(np.asarray(v, dtype=np.float64).copy())
    return sd


def _compare(ref_main, ref_aux, ours):
    main, aux = ours
    return (util.max_abs_diff(ref_main, main), util.max_abs_diff(ref_aux, aux))


def test_pspnet_resnet34_matches_reference():
    from model.modeling.pspnet_pytorch.pspnet import PSPNet as RefPSPNet
    from csbsr_tpu.models.pspnet import PSPNet

    with util.x64():
        model = PSPNet(n_classes=1, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_pspnet)

        ref = RefPSPNet(n_classes=1, pretrained=False).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(3).rand(2, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_main, ref_aux = ref(torch.from_numpy(x))
        md, ad = _compare(ref_main, ref_aux, model.apply(variables, util.nhwc(x)))
    assert md < 1e-8, f"PSPNet main mismatch: {md}"
    assert ad < 1e-8, f"PSPNet aux mismatch: {ad}"


@pytest.mark.slow
@pytest.mark.parametrize("backend,psp_size,deep", [
    ("resnet18", 512, 256),
    ("resnet50", 2048, 1024),
])
def test_pspnet_extractor_zoo_matches_reference(backend, psp_size, deep):
    """BasicBlock (18) and Bottleneck (50) extractor families
    (`extractors.py:14-110`), dilated stages included."""
    from model.modeling.pspnet_pytorch.pspnet import PSPNet as RefPSPNet
    from csbsr_tpu.models.pspnet import PSPNet

    with util.x64():
        model = PSPNet(n_classes=1, backend=backend, dtype=jnp.float64)
        variables = model.init(jax.random.PRNGKey(10), jnp.zeros((1, 64, 64, 3), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_pspnet)

        ref = RefPSPNet(n_classes=1, backend=backend, psp_size=psp_size,
                        deep_features_size=deep, pretrained=False).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        x = np.random.RandomState(5).rand(1, 3, 64, 64).astype(np.float64)
        with torch.no_grad():
            ref_main, ref_aux = ref(torch.from_numpy(x))
        md, ad = _compare(ref_main, ref_aux, model.apply(variables, util.nhwc(x)))
    assert md < 1e-8, f"PSPNet[{backend}] main mismatch: {md}"
    assert ad < 1e-8, f"PSPNet[{backend}] aux mismatch: {ad}"


def test_pspnet_blurskip_matches_reference():
    """BlurSkip ladder (SFTLikeBlock/ConvBlock alternation,
    `pspnet.py:142-151,174-207`) with the flagship 21^2 kernel dim."""
    from model.modeling.pspnet_pytorch.pspnet import PSPNet_BlurSkip as RefBlurSkip
    from csbsr_tpu.models.pspnet import PSPNetBlurSkip

    blur_dim = 21 ** 2
    with util.x64():
        model = PSPNetBlurSkip(n_classes=1, n_layer_blurskip=2, dtype=jnp.float64)
        variables = model.init(
            jax.random.PRNGKey(12), jnp.zeros((1, 64, 64, 3), jnp.float64),
            jnp.zeros((1, blur_dim), jnp.float64))
        variables = util.promote_f64(variables)
        sd = _export_f64(variables, translators.translate_pspnet)

        ref = RefBlurSkip(blur_dim, n_classes=1, pretrained=False,
                          n_layer_blurskip=2).double().eval()
        util.load_strict_no_unexpected(ref, sd)

        rs = np.random.RandomState(6)
        x = rs.rand(1, 3, 64, 64).astype(np.float64)
        k = rs.rand(1, blur_dim).astype(np.float64)
        k = k / k.sum(axis=1, keepdims=True)
        with torch.no_grad():
            # the reference receives the kernel as a constant map and GAPs it
            kmap = torch.from_numpy(k)[:, :, None, None].expand(1, blur_dim, 8, 8)
            ref_main, ref_aux = ref(torch.from_numpy(x), kmap)
        ours = model.apply(variables, util.nhwc(x), jnp.asarray(k))
        md, ad = _compare(ref_main, ref_aux, ours)
    assert md < 1e-8, f"BlurSkip main mismatch: {md}"
    assert ad < 1e-8, f"BlurSkip aux mismatch: {ad}"
