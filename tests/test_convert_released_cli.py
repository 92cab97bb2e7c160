"""End-to-end released-checkpoint conversion: a synthetic iteration_N.pth
(reference key names, module.-prefixed) goes through tools/convert_released.py
and the resulting orbax checkpoint drives the inference engine.

This is the 'one command' of VERDICT r1 #3, proven without the real weights.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_yaml(tmp_path_factory):
    p = tmp_path_factory.mktemp("cfg") / "config.yaml"
    p.write_text(
        """
MODEL:
  SR: "KBPN"
  SCALE_FACTOR: 4
  NUM_STAGES: 2
  DETECTOR_TYPE: "PSPNet"
SOLVER:
  NORM_SR_OUTPUT: "instance"
BLUR:
  KERNEL_SIZE: 7
  KERNEL_SIZE_OUTPUT: 7
INPUT:
  IMAGE_SIZE: [32, 32]
TPU:
  COMPUTE_DTYPE: "float32"
"""
    )
    return str(p)


def _roundtrip(cfg_path, overrides, tmp_path, lr_hw):
    """Synthesize a reference-layout iteration_N.pth from our own params via
    the name translators, convert it with tools/convert_released.py, restore
    the orbax checkpoint and check the forward is bit-preserved."""
    torch = pytest.importorskip("torch")
    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils import translators
    from csbsr_tpu.utils.pretrained import seg_translator_for, sr_translator_for
    from csbsr_tpu.utils.torch_convert import export_params_to_torch_names

    cfg = get_cfg_defaults()
    cfg.merge_from_file(cfg_path)
    cfg.merge_from_list(overrides)
    model = model_from_cfg(cfg)
    variables = jax.jit(
        lambda k: model.init({"params": k}, jnp.zeros((1, lr_hw, lr_hw, 3)), None,
                             False, train=False)
    )(jax.random.PRNGKey(3))
    params, stats = variables["params"], variables.get("batch_stats", {})

    if "parallel_model" in params:
        mods = [("parallel_model", translators.make_translate_dsrl(cfg.MODEL.SCALE_FACTOR))]
    else:
        mods = [("sr_model", sr_translator_for(cfg)),
                ("segmentation_model", seg_translator_for(cfg))]
        if cfg.MODEL.SR in ("bicubic", "none") or cfg.MODEL.SCALE_FACTOR == 1:
            mods = mods[1:]
    sd = {}
    for mod, translate in mods:
        for tree in (params.get(mod) or {}, stats.get(mod) or {}):
            for k, v in export_params_to_torch_names(tree, translate).items():
                # DataParallel prefix, stripped by fix_model_state_dict parity
                sd[f"module.{mod}.{k}"] = torch.from_numpy(np.asarray(v).copy())
    pth = tmp_path / "iteration_1234.pth"
    torch.save(sd, pth)

    out_dir = tmp_path / "released"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_released.py"),
         "--config", str(cfg_path), "--pth", str(pth), "--out", str(out_dir)]
        + list(overrides),
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout[-1000:] + r.stderr[-2000:]
    assert (out_dir / "checkpoints" / "1234").is_dir()
    assert (out_dir / "config.yaml").is_file()

    # the converted checkpoint drives inference (what `test.py <dir> 1234` does)
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(str(out_dir / "checkpoints" / "1234"))
    v2 = {"params": restored["params"], "batch_stats": restored.get("batch_stats", {})}
    x = jnp.asarray(np.random.RandomState(0).rand(2, lr_hw, lr_hw, 3).astype(np.float32))
    out = model.apply(v2, x, None, False, train=False, clip_sr=True)
    ref = model.apply(variables, x, None, False, train=False, clip_sr=True)
    np.testing.assert_allclose(np.asarray(out["sr"]), np.asarray(ref["sr"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["seg"]), np.asarray(ref["seg"]), atol=1e-5)


# all 7 released README rows (`/root/reference/README.md:85-91`); wf shares
# the pspnet architecture but is kept as its own row so every README line
# has a proven .pth -> orbax -> inference path (VERDICT r2 item 4)
RECIPES = [
    "csbsr_pspnet",
    "csbsr_hrnet",
    "csbsr_crackformer",
    "csbsr_unet",
    "cssr_pspnet",
    "csbsr_pspnet_wf",
    "csbsr_pspnet_blurskip",
]


@pytest.mark.parametrize("recipe", RECIPES)
def test_released_cli_roundtrip_all_recipes(recipe, tmp_path):
    cfg_path = os.path.join(REPO, "configs", f"config_{recipe}.yaml")
    overrides = ["INPUT.IMAGE_SIZE", "[32, 32]", "TPU.COMPUTE_DTYPE", "float32"]
    _roundtrip(cfg_path, overrides, tmp_path, lr_hw=8)


def test_released_cli_roundtrip_dsrl_joint(tmp_path):
    """The DSRL joint layout: iteration_N.pth holds parallel_model.* keys
    (`build_model.py:335-350` module tree)."""
    p = tmp_path / "dsrl.yaml"
    p.write_text(
        "MODEL:\n  SR: \"DSRL\"\n  DETECTOR_TYPE: \"DSRL\"\n"
        "INPUT:\n  IMAGE_SIZE: [64, 64]\n"
        "TPU:\n  COMPUTE_DTYPE: \"float32\"\n"
    )
    _roundtrip(str(p), [], tmp_path, lr_hw=16)


@pytest.mark.quick
def test_parity_check_cli_runs(tmp_path):
    """tools/parity_check.py end to end on synthetic weights + fixture data:
    converts, evaluates, emits the comparison JSON (parity False with random
    weights, exit code 1 by design)."""
    torch = pytest.importorskip("torch")
    import json
    from PIL import Image
    from csbsr_tpu.config import get_cfg_defaults
    from csbsr_tpu.models import model_from_cfg
    from csbsr_tpu.utils.pretrained import seg_translator_for, sr_translator_for
    from csbsr_tpu.utils.torch_convert import export_params_to_torch_names
    from csbsr_tpu.data.make_test_blur import make_test_blur_dir

    # fixture data (96x96 so the 224-LR patching degenerates to 1 bucket-padded call)
    img_dir = tmp_path / "images"; mask_dir = tmp_path / "masks"
    img_dir.mkdir(); mask_dir.mkdir()
    r = np.random.RandomState(5)
    for i in range(2):
        Image.fromarray((r.rand(96, 96, 3) * 255).astype(np.uint8)).save(img_dir / f"i{i}.jpg")
        Image.fromarray(((r.rand(96, 96) > 0.85) * 255).astype(np.uint8), "L").save(mask_dir / f"i{i}.jpg")
    blur_dir = tmp_path / "test_blured"
    make_test_blur_dir(str(img_dir), str(blur_dir / "02_40"), kernel_size=21)

    # synthetic released checkpoint for the cssr_pspnet recipe (DBPN - the
    # smallest released config)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(REPO, "configs", "config_cssr_pspnet.yaml"))
    model = model_from_cfg(cfg)
    ph = int(cfg.INPUT.IMAGE_SIZE[0] / cfg.MODEL.SCALE_FACTOR)
    variables = jax.jit(lambda k: model.init({"params": k}, jnp.zeros((1, ph, ph, 3)), None, False, train=False))(
        jax.random.PRNGKey(0))
    sd = {}
    for mod, translate in (("sr_model", sr_translator_for(cfg)),
                           ("segmentation_model", seg_translator_for(cfg))):
        for tree in (variables["params"][mod], (variables.get("batch_stats") or {}).get(mod) or {}):
            for k, v in export_params_to_torch_names(tree, translate).items():
                sd[f"{mod}.{k}"] = torch.from_numpy(np.asarray(v).copy())
    pth = tmp_path / "iteration_99.pth"
    torch.save(sd, pth)

    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_check.py"),
         "--recipe", "cssr_pspnet", "--pth", str(pth),
         "--image_dir", str(img_dir), "--mask_dir", str(mask_dir),
         "--blur_dir", str(blur_dir), "--skip_hd", "--platform", "cpu",
         "--workdir", str(tmp_path / "work"),
         "INPUT.IMAGE_SIZE", "[96,96]"],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert res.returncode == 1, (res.returncode, res.stderr[-2000:])
    report = json.loads(res.stdout[res.stdout.index("{"):])
    assert report["recipe"] == "cssr_pspnet" and report["parity"] is False
    assert any(row["metric"] == "AIU" for row in report["rows"])
