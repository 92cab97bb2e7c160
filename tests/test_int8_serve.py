"""Opt-in int8 serving path (CSBSR_INT8_SERVE): param-layout parity with the
bf16 modules, quantization error bounds, and the flax-native calibration
(`quant` collection) round-trip."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import csbsr_tpu.models.blocks as blocks_mod
from csbsr_tpu.models.blocks import ConvBlock, DeconvBlock, SFTLayer, UpBlock


def _params_equal(a, b):
    fa = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(a)}
    fb = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert set(fa) == set(fb), set(fa) ^ set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]))


@pytest.mark.parametrize("cls,kw", [
    (ConvBlock, dict(features=12, kernel_size=3, stride=1, padding=1,
                     use_bias=True, activation="prelu", norm=None, prelu_init=0.25)),
    (DeconvBlock, dict(features=12, kernel_size=8, stride=4, padding=2,
                       use_bias=True, activation="prelu", norm=None, prelu_init=0.25)),
])
@pytest.mark.quick
def test_int8_param_layout_and_error(monkeypatch, cls, kw):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 8).astype(np.float32))

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    m = cls(dtype=jnp.float32, **kw)
    v_ref = m.init(jax.random.PRNGKey(0), x, False)
    y_ref = m.apply(v_ref, x, False)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), x, False)
    # identical param tree -> any checkpoint serves in either mode
    _params_equal(v_ref["params"], v_q["params"])
    # calibration init also records an activation abs-max
    assert float(jax.tree_util.tree_leaves(v_q["quant"])[0]) > 0

    # dynamic-scale serving (no quant collection passed)
    y_dyn = m.apply({"params": v_ref["params"]}, x, False)
    rel = float(jnp.linalg.norm(y_dyn - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.05, rel

    # static-scale serving (calibrated collection passed) stays close too
    y_st = m.apply({"params": v_ref["params"], "quant": v_q["quant"]}, x, False)
    rel = float(jnp.linalg.norm(y_st - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.05, rel


@pytest.mark.quick
def test_int8_train_path_is_exact(monkeypatch):
    # train=True must bypass quantization entirely (identical to bf16 path)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 4).astype(np.float32))
    m = ConvBlock(features=6, kernel_size=3, stride=1, padding=1, use_bias=True,
                  activation=None, norm=None, dtype=jnp.float32)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, True)
    y_ref = m.apply(v, x, True)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    y_tr = m.apply(v, x, True)
    np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_ref), atol=0)


def test_int8_calibrate_then_serve_upblock(monkeypatch):
    # end-to-end on a composite block: calibrate (bf16 numerics + amax
    # recording), then serve statically; spot-check output quality
    x = jnp.asarray(np.random.RandomState(2).rand(2, 8, 8, 16).astype(np.float32))
    m = UpBlock(num_filter=16, dtype=jnp.float32)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, False)
    y_ref = m.apply(v, x, False)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    # calibration pass: bf16 numerics, records abs-maxima
    y_cal, updated = m.apply({"params": v["params"]}, x, False, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_ref), rtol=1e-6)
    amaxes = [float(a) for a in jax.tree_util.tree_leaves(updated["quant"])]
    assert len(amaxes) == 3 and all(a > 0 for a in amaxes)

    y_q = m.apply({"params": v["params"], "quant": updated["quant"]}, x, False)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.10, rel


def test_int8_inference_harness_end_to_end(monkeypatch, tmp_path, tmp_path_factory):
    # the shipped serving surface: test.py --int8_serve ==
    # calibrate_int8 + inference_for_ss with static scales
    from tests.test_train_step import tiny_cfg
    from PIL import Image

    root = tmp_path_factory.mktemp("int8data")
    img_dir, mask_dir = root / "gt" / "images", root / "gt" / "masks"
    img_dir.mkdir(parents=True), mask_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(img_dir / "im0.jpg")
    Image.fromarray(((rng.rand(64, 64) > 0.8) * 255).astype(np.uint8), "L").save(
        mask_dir / "im0.jpg"
    )
    from csbsr_tpu.data.make_test_blur import make_test_blur_dir

    blur_dir = root / "test_blured"
    make_test_blur_dir(str(img_dir), str(blur_dir / "02_40"), kernel_size=7)

    cfg = tiny_cfg(**{
        "INPUT.IMAGE_SIZE": [32, 32],
        "BLUR.KERNEL_SIZE_OUTPUT": 7,
        "DATASET.TEST_IMAGE_DIR": str(img_dir),
        "DATASET.TEST_MASK_DIR": str(mask_dir),
        "DATASET.TEST_BLURED_DIR": str(blur_dir),
    })
    from csbsr_tpu.data import CrackDataSetTest
    from csbsr_tpu.engine.inference import calibrate_int8, inference_for_ss
    from csbsr_tpu.models import model_from_cfg

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    model = model_from_cfg(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((4, 8, 8, 3)), None, False,
        train=False,
    )
    ds = CrackDataSetTest(cfg, str(img_dir), str(mask_dir), str(blur_dir), "02_40")
    try:
        variables_q = calibrate_int8(model, variables, ds.get(0)[0])
        assert blocks_mod.INT8_SERVE and "quant" in variables_q
        summary = inference_for_ss(
            cfg, model, variables_q, ds, output_dir=str(tmp_path / "eval_int8"),
            test_aiu=True, save_images=False, log_fn=lambda *a: None,
        )
    finally:
        blocks_mod.INT8_SERVE = False
    for key in ("PSNR", "SSIM", "AIU", "IoU_max"):
        assert key in summary and np.isfinite(summary[key]), (key, summary)


def test_int8_pspnet_head(monkeypatch):
    # the seg head quantizes through the qconv factory (pspnet.py): param
    # tree identical to the bf16 tree, calibrated eval output close
    from csbsr_tpu.models.pspnet import PSPNet

    x = jnp.asarray(np.random.RandomState(6).rand(1, 32, 32, 3).astype(np.float32))
    m = PSPNet(n_classes=1, backend="resnet18", dtype=jnp.float32)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, False)
    main_ref, aux_ref = m.apply(v, x, False)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), x, False)
    _params_equal(v["params"], v_q["params"])
    # calibrate (bf16 numerics), then serve statically
    (main_cal, _), upd = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, False,
        mutable=["quant"],
    )
    np.testing.assert_allclose(np.asarray(main_cal), np.asarray(main_ref), rtol=1e-5)
    main_q, aux_q = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"],
         "quant": upd["quant"]}, x, False,
    )
    # sigmoid outputs in [0,1]: absolute deviation is the right metric
    assert float(jnp.abs(main_q - main_ref).max()) < 0.05
    assert float(jnp.abs(aux_q - aux_ref).max()) < 0.05
    # train path must bypass quantization (params-only apply, no quant vars)
    out_tr = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert all(np.isfinite(np.asarray(t)).all() for t in out_tr[0])


def test_int8_sft_layer(monkeypatch):
    x = jnp.asarray(np.random.RandomState(4).rand(2, 8, 8, 16).astype(np.float32))
    c = jnp.asarray(np.random.RandomState(5).rand(2, 8, 8, 4).astype(np.float32))
    m = SFTLayer(out_features=16, dtype=jnp.float32)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, c)
    y_ref = m.apply(v, x, c)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), x, c)
    _params_equal(v["params"], v_q["params"])
    y_q = m.apply({"params": v["params"]}, x, c)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.05, rel


def test_int8_sft_layer_kbpn(monkeypatch):
    """KBPN's banded-condition SFT: int8 serving must keep the param tree
    identical to bf16 (checkpoint interchange), calibrate via the quant
    collection, agree numerically, and bypass quantization when train=True."""
    from csbsr_tpu.models.kbpn import SFTLayerKBPN

    rng = np.random.RandomState(6)
    feats = jnp.asarray(rng.rand(2, 8, 8, 24).astype(np.float32))
    kvec = jnp.asarray(rng.rand(2, 49).astype(np.float32))
    m = SFTLayerKBPN(out_features=24, dtype=jnp.float32)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), feats, kvec)
    y_ref = m.apply(v, feats, kvec)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), feats, kvec)
    _params_equal(v["params"], v_q["params"])
    # calibration pass records act_amax for the split-cond convs
    y_cal, upd = m.apply(v, feats, kvec, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(y_cal), np.asarray(y_ref), rtol=1e-5)
    flat = jax.tree_util.tree_leaves(upd["quant"])
    assert flat and all(float(a) > 0 for a in flat)
    y_q = m.apply(dict(v, quant=upd["quant"]), feats, kvec)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.05, rel
    # train=True must run the exact bf16 math even with INT8_SERVE on
    y_tr = m.apply(v, feats, kvec, True)
    np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_ref), rtol=1e-5)


def test_int8_crackformer_head(monkeypatch):
    """CrackFormer quantizes through the qconv factory: identical param
    tree, calibration pass exactly bf16, whole-net int8 serve runs finite.

    No whole-net deviation bound on purpose: the encoder's max-pool-with-
    indices routes the decoder by argmax, so any quantization perturbation
    can flip indices - a DISCRETE routing change whose size is checkpoint-
    dependent, not a smooth numeric error (tools/int8_accuracy.py is the
    per-checkpoint gate). The smooth-path numerics are pinned on a single
    TFBlock below instead."""
    from csbsr_tpu.models.crackformer import CrackFormer, TFBlock

    x = jnp.asarray(np.random.RandomState(7).rand(1, 32, 32, 3).astype(np.float32))
    m = CrackFormer(dtype=jnp.float32)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, False)
    fuse_ref, _ = m.apply(v, x, False)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), x, False)
    _params_equal(v["params"], v_q["params"])
    (fuse_cal, _), upd = m.apply({"params": v["params"]}, x, False, mutable=["quant"])
    np.testing.assert_allclose(np.asarray(fuse_cal), np.asarray(fuse_ref), rtol=1e-5)
    fuse_q, sides_q = m.apply({"params": v["params"], "quant": upd["quant"]}, x, False)
    assert np.isfinite(np.asarray(fuse_q)).all() and np.isfinite(np.asarray(sides_q)).all()

    # smooth path (no pooling): one TFBlock must agree closely
    xb = jnp.asarray(np.random.RandomState(9).rand(1, 16, 16, 64).astype(np.float32))
    tb = TFBlock(64, dtype=jnp.float32)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    vb = tb.init(jax.random.PRNGKey(1), xb)
    yb_ref = tb.apply(vb, xb)
    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    _, updb = tb.apply({"params": vb["params"]}, xb, mutable=["quant"])
    yb_q = tb.apply({"params": vb["params"], "quant": updb["quant"]}, xb)
    rel = float(jnp.linalg.norm(yb_q - yb_ref) / (jnp.linalg.norm(yb_ref) + 1e-9))
    assert rel < 0.05, rel


def test_int8_dsrl_head(monkeypatch):
    from csbsr_tpu.models.dsrl import DSRL

    x = jnp.asarray(np.random.RandomState(8).rand(1, 32, 32, 3).astype(np.float32))
    m = DSRL(num_classes=1, scale_factor=2, backbone="mobilenet", dtype=jnp.float32)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", False)
    v = m.init(jax.random.PRNGKey(0), x, False)
    seg_ref, sr_ref, _, _ = m.apply(v, x, False)

    monkeypatch.setattr(blocks_mod, "INT8_SERVE", True)
    v_q = m.init(jax.random.PRNGKey(0), x, False)
    _params_equal(v["params"], v_q["params"])
    (out_cal, upd) = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]}, x, False,
        mutable=["quant"],
    )
    np.testing.assert_allclose(np.asarray(out_cal[0]), np.asarray(seg_ref), rtol=1e-5)
    seg_q, sr_q, _, _ = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"],
         "quant": upd["quant"]}, x, False,
    )
    assert float(jnp.abs(seg_q - seg_ref).max()) < 0.06  # sigmoid output
    # random-init numeric bound for a 19-block depthwise chain; real use is
    # gated on tools/int8_accuracy.py per checkpoint
    rel = float(jnp.linalg.norm(sr_q - sr_ref) / (jnp.linalg.norm(sr_ref) + 1e-9))
    assert rel < 0.10, rel


def test_int8_gate_on_trained_checkpoint(rng, tmp_path):
    """VERDICT r4: the int8 accuracy gate (tools/int8_accuracy.py) must run
    green on a TRAINED checkpoint artifact, not only random init - train a
    few do_train iterations, checkpoint, then run the gate end-to-end via
    its importable entry point."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tests.test_train_step import tiny_cfg, make_batch
    from csbsr_tpu.engine import do_train
    from csbsr_tpu.models import model_from_cfg
    from tools.int8_accuracy import run

    cfg = tiny_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.freeze()
    batches = [{k: np.asarray(v) for k, v in make_batch(rng, b=8, hw=32).items()}
               for _ in range(4)]
    model = model_from_cfg(cfg)
    do_train(cfg, model, batches, [dict(batches[0], degrade_seed=3)],
             log_step=4, save_step=4, eval_step_every=0, num_train_ds=100)

    out = run(cfg=cfg, ckpt=(str(tmp_path), 4), batch=2, patch=16)
    assert out["weights"] == "checkpoint"
    # trained-weights agreement: the per-checkpoint gate quantities exist
    # and the quantized path tracks bf16 closely on this checkpoint
    assert out["sr_psnr_bf16_vs_int8"] > 30.0, out
    # few-iteration checkpoints keep seg probs near the 0.5 threshold, so
    # thresholded agreement is noisier than it is on converged weights
    # (measured 0.937 at 4 iters); the production gate criterion lives in
    # PERF.md and is evaluated per real checkpoint.
    assert out["seg_agreement_iou@0.5"] > 0.85, out
    assert np.isfinite(out["seg_max_prob_deviation"])
