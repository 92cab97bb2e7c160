"""Engine-level inference harness test (CPU, tiny model, synthetic fixture)."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train_step import tiny_cfg


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("testdata")
    img_dir = root / "gt" / "images"
    mask_dir = root / "gt" / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.RandomState(7)
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img_dir / f"im{i}.jpg")
        Image.fromarray(((rng.rand(64, 64) > 0.8) * 255).astype(np.uint8), "L").save(
            mask_dir / f"im{i}.jpg"
        )
    from csbsr_tpu.data.make_test_blur import make_test_blur_dir

    blur_root = root / "test_blured" / "02_40"
    n = make_test_blur_dir(str(img_dir), str(blur_root), kernel_size=7)
    assert n == 2
    return str(img_dir), str(mask_dir), str(root / "test_blured")


def test_inference_for_ss_end_to_end(fixture_dirs, tmp_path):
    img_dir, mask_dir, blur_dir = fixture_dirs
    cfg = tiny_cfg(**{
        "INPUT.IMAGE_SIZE": [32, 32],  # patch 8 -> 2x2 patches per 16px LR
        "BLUR.KERNEL_SIZE_OUTPUT": 7,
        "DATASET.TEST_IMAGE_DIR": img_dir,
        "DATASET.TEST_MASK_DIR": mask_dir,
        "DATASET.TEST_BLURED_DIR": blur_dir,
    })
    from csbsr_tpu.data import CrackDataSetTest
    from csbsr_tpu.engine.inference import inference_for_ss
    from csbsr_tpu.models import model_from_cfg

    model = model_from_cfg(cfg)
    patches0 = jnp.zeros((4, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, patches0, None, False, train=False
    )
    ds = CrackDataSetTest(cfg, img_dir, mask_dir, blur_dir, "02_40")
    out_dir = str(tmp_path / "eval")
    summary = inference_for_ss(
        cfg, model, variables, ds, output_dir=out_dir,
        test_aiu=True, test_surface_distance=True, save_images=True,
        log_fn=lambda *a: None,
    )
    for key in ("PSNR", "SSIM", "AIU", "IoU_max", "AHD", "AMSD"):
        assert key in summary and np.isfinite(summary[key]), (key, summary)
    assert os.path.isfile(os.path.join(out_dir, "iou_log.csv"))
    assert os.path.isdir(os.path.join(out_dir, "masks", "th_0.50"))
    assert os.path.isdir(os.path.join(out_dir, "images"))
    # observability artifacts (reference inference.py:148-207 parity):
    # per-image metric rows + threshold-curve plots
    import json

    rows = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    per_img = [r for r in rows if "PSNR_score" in r]
    assert len(per_img) == len(ds)
    assert all("HD95_scores" in r for r in per_img)
    assert any("PSNR_mean" in r and "HD95_score_median" in r for r in rows)
    for png in ("IoU", "HD95", "HD95_median", "MSD", "MSD_median"):
        assert os.path.isfile(os.path.join(out_dir, f"{png}_vs_threshold.png")), png


@pytest.fixture(scope="module")
def retinal_fixture_dirs(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("RetinalSeg")
    img_dir = root / "gt" / "images"
    mask_dir = root / "gt" / "masks"
    img_dir.mkdir(parents=True)
    mask_dir.mkdir(parents=True)
    rng = np.random.RandomState(17)
    for i in range(2):
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img_dir / f"r{i}.png")
        # retinal masks are 0/1 valued on disk (the dataset scales them x255)
        Image.fromarray((rng.rand(64, 64) > 0.8).astype(np.uint8), "L").save(
            mask_dir / f"r{i}.png"
        )
    from csbsr_tpu.data.make_test_blur import make_test_blur_dir

    blur_root = root / "test_blured" / "02_40"
    n = make_test_blur_dir(str(img_dir), str(blur_root), pattern="*.png", kernel_size=7)
    assert n == 2
    return str(img_dir), str(mask_dir), str(root / "test_blured")


def test_retinal_inference_with_classification_metrics(retinal_fixture_dirs, tmp_path):
    img_dir, mask_dir, blur_dir = retinal_fixture_dirs
    cfg = tiny_cfg(**{
        "INPUT.IMAGE_SIZE": [32, 32],
        "BLUR.KERNEL_SIZE_OUTPUT": 7,
        "DATASET.TEST_IMAGE_DIR": img_dir,
        "DATASET.TEST_MASK_DIR": mask_dir,
        "DATASET.TEST_BLURED_DIR": blur_dir,
    })
    from csbsr_tpu.data import RetinalDataSetTest
    from csbsr_tpu.engine.inference import inference_for_ss
    from csbsr_tpu.models import model_from_cfg

    model = model_from_cfg(cfg)
    patches0 = jnp.zeros((4, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, patches0, None, False, train=False
    )
    ds = RetinalDataSetTest(cfg, img_dir, mask_dir, blur_dir, "02_40")
    assert len(ds) == 2
    # dataset masks are binary after the x255 scaling + /255 transform
    _, _, seg_t, _, _, _, _ = ds.get(0)
    assert set(np.unique(seg_t)) <= {0.0, 1.0}
    summary = inference_for_ss(
        cfg, model, variables, ds, output_dir=str(tmp_path / "eval"),
        test_aiu=False, test_classification_metrics=True, save_images=False,
        log_fn=lambda *a: None,
    )
    for key in ("Acc", "Sens", "Spec"):
        assert key in summary and 0.0 <= summary[key] <= 1.0, (key, summary)


def test_tti_inference_end_to_end(retinal_fixture_dirs, tmp_path):
    img_dir, _, _ = retinal_fixture_dirs
    cfg = tiny_cfg(**{
        "INPUT.IMAGE_SIZE": [8, 8],  # TTI patches the *input* at IMAGE_SIZE
        "BLUR.KERNEL_SIZE_OUTPUT": 7,
        "DATASET.TEST_IMAGE_DIR": img_dir,
    })
    from csbsr_tpu.data import TTICrackDataSetTest
    from csbsr_tpu.engine.inference import inference_tti
    from csbsr_tpu.models import model_from_cfg

    model = model_from_cfg(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((4, 8, 8, 3)), None, False, train=False
    )
    ds = TTICrackDataSetTest(cfg, img_dir)
    assert len(ds) == 2
    out_dir = str(tmp_path / "tti")
    inference_tti(cfg, model, variables, ds, output_dir=out_dir, log_fn=lambda *a: None)
    assert os.path.isdir(os.path.join(out_dir, "images"))
    assert os.path.isdir(os.path.join(out_dir, "masks", "th_0.50"))
    # KBPN kernel dumps (`inference.py:259-260` parity)
    assert os.path.isdir(os.path.join(out_dir, "kernels_max"))
    assert os.path.isdir(os.path.join(out_dir, "kernels_sum"))


@pytest.mark.quick
def test_chop_forward_matches_direct(rng):
    from csbsr_tpu.utils.misc import chop_forward
    from csbsr_tpu.ops.resize import resize

    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))

    def fwd(v):
        return resize(v, (v.shape[1] * 4, v.shape[2] * 4), method="bilinear")

    # tiling a *local* operator reproduces the direct result in the interior
    direct = np.asarray(fwd(x))
    tiled = np.asarray(chop_forward(x, fwd, scale=4, shave=4, min_size=10**9))
    assert tiled.shape == direct.shape
    np.testing.assert_allclose(tiled[:, 16:-16, 16:-16], direct[:, 16:-16, 16:-16], atol=1e-4)


def test_sr_seg_inv_step(rng):
    from tests.test_train_step import make_batch, _setup

    cfg = tiny_cfg(**{
        "MODEL.SR_SEG_INV": True,
        "MODEL.DETECTOR_TYPE": "u-net16",
        "SOLVER.SR_LOSS_FUNC": "L1",
        "SOLVER.SEG_LOSS_FUNC": "Dice",
    })
    batch = make_batch(rng)
    model, pc, state, step = _setup(cfg, batch)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_inference_for_ss_int8_serve(fixture_dirs, tmp_path):
    """The test.py --int8_serve surface: calibrate on the first test item,
    run the full harness in int8 serving mode, restore the bf16 mode."""
    img_dir, mask_dir, blur_dir = fixture_dirs
    cfg = tiny_cfg(**{
        "INPUT.IMAGE_SIZE": [32, 32],
        "BLUR.KERNEL_SIZE_OUTPUT": 7,
        "DATASET.TEST_IMAGE_DIR": img_dir,
        "DATASET.TEST_MASK_DIR": mask_dir,
        "DATASET.TEST_BLURED_DIR": blur_dir,
    })
    from csbsr_tpu.data import CrackDataSetTest
    from csbsr_tpu.engine.inference import calibrate_int8, inference_for_ss
    from csbsr_tpu.models import model_from_cfg
    import csbsr_tpu.models.blocks as blocks_mod

    model = model_from_cfg(cfg)
    patches0 = jnp.zeros((4, 8, 8, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, patches0, None, False, train=False
    )
    ds = CrackDataSetTest(cfg, img_dir, mask_dir, blur_dir, "02_40")
    try:
        variables = calibrate_int8(model, variables, ds.get(0)[0])
        assert "quant" in variables and blocks_mod.INT8_SERVE
        summary = inference_for_ss(
            cfg, model, variables, ds, output_dir=str(tmp_path / "eval_int8"),
            test_aiu=True, test_surface_distance=False, save_images=False,
            log_fn=lambda *a: None,
        )
    finally:
        blocks_mod.INT8_SERVE = False
    for key in ("PSNR", "SSIM", "AIU", "IoU_max"):
        assert key in summary and np.isfinite(summary[key]), (key, summary)
