"""Golden-value tests for losses and metrics vs reference formulas."""
import numpy as np
import pytest
import jax.numpy as jnp

from csbsr_tpu.losses import (
    weighted_bce,
    binary_dice,
    bce_dice,
    boundary_combo_loss,
    boundary_loss,
    kbpn_loss,
    get_pseudo_lr,
)
from csbsr_tpu.metrics import (
    psnr,
    ssim,
    iou_thresholds,
    compute_surface_distances,
    compute_robust_hausdorff,
    calc_distance_metrics,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _rand_pred_target(rng, b=2, h=24, w=24):
    pred = rng.rand(b, h, w, 1).astype(np.float32)
    target = (rng.rand(b, h, w, 1) > 0.7).astype(np.float32)
    return pred, target


def test_weighted_bce_matches_formula(rng):
    pred, target = _rand_pred_target(rng)
    ours = np.asarray(weighted_bce(jnp.asarray(pred), jnp.asarray(target), (20, 1)))
    s = 1e-8
    p = np.clip(pred, s, None)
    ref = -(20 * target * np.log(p + s) + 1 * (1 - target) * np.log(1 - p + s)) / 21
    np.testing.assert_allclose(ours, ref.mean(axis=(1, 2, 3)), rtol=1e-5)


def test_weighted_bce_saturated_probs_finite(rng):
    """bf16-saturated probabilities (exactly 0.0 / 1.0) must yield a finite
    loss. The naive `log(1 - p + eps)` is only finite by evaluation ORDER;
    XLA:TPU reassociates it to `(1 + eps) - p` == `1 - p` and produced
    0*log(0) = NaN the first time training saturated the seg head (round-5
    dress rehearsal, iteration 603). The complement clip in weighted_bce is
    the barrier; this pins the contract (and the parity of the clipped form
    with the reference arithmetic away from saturation)."""
    pred = np.array([[[[0.0], [1.0]], [[1.0], [0.5]]]], np.float32)
    target = np.array([[[[0.0], [1.0]], [[0.0], [1.0]]]], np.float32)
    out = np.asarray(weighted_bce(jnp.asarray(pred), jnp.asarray(target), (1, 1)))
    assert np.isfinite(out).all()
    combo = np.asarray(boundary_combo_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.float32(1.0)))
    assert np.isfinite(combo).all()


def test_binary_dice_matches_formula(rng):
    pred, target = _rand_pred_target(rng)
    ours = np.asarray(binary_dice(jnp.asarray(pred), jnp.asarray(target)))
    pf = pred.reshape(2, -1)
    tf = target.reshape(2, -1)
    num = 2 * (pf * tf).sum(1) + 1e-6
    den = (pf**2 + tf**2).sum(1) + 1e-6
    np.testing.assert_allclose(ours, 1 - num / den, rtol=1e-5)


def test_boundary_loss_matches_scipy_sdf(rng):
    from scipy.ndimage import distance_transform_edt as distance

    pred, target = _rand_pred_target(rng, b=2, h=20, w=20)

    def ref_sdf(mask):
        pos = mask.astype(bool)
        if not pos.any():
            return np.zeros_like(mask, dtype=np.float64)
        posdis = distance(pos)
        negdis = distance(~pos)
        sdf = (negdis - negdis.min()) / (negdis.max() - negdis.min()) - (
            posdis - posdis.min()
        ) / (posdis.max() - posdis.min())
        p = np.pad(pos, 1, constant_values=True)
        inner = p[:-2, 1:-1] & p[2:, 1:-1] & p[1:-1, :-2] & p[1:-1, 2:]
        sdf[pos & ~inner] = 0
        return sdf

    expected = np.stack([(pred[b, :, :, 0] * ref_sdf(target[b, :, :, 0])).mean() for b in range(2)])
    ours = np.asarray(boundary_loss(jnp.asarray(pred), jnp.asarray(target)))
    np.testing.assert_allclose(ours, expected, atol=1e-4)


def test_boundary_combo_alpha_blend(rng):
    pred, target = _rand_pred_target(rng)
    a = 0.7
    combo = np.asarray(
        boundary_combo_loss(jnp.asarray(pred), jnp.asarray(target), a, (1, 1), (1, 1))
    )
    wd = np.asarray(bce_dice(jnp.clip(jnp.asarray(pred), 1e-8, None), jnp.asarray(target)))
    bd = np.asarray(boundary_loss(jnp.clip(jnp.asarray(pred), 1e-8, None), jnp.asarray(target)))
    np.testing.assert_allclose(combo, a * wd + (1 - a) * bd, rtol=1e-5)


def test_pseudo_lr_matches_torch_loop(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    b, hw, k, sf = 2, 32, 7, 4
    sr = rng.rand(b, hw, hw, 3).astype(np.float32)
    kvec = rng.rand(b, k * k).astype(np.float32)
    lr, k2d = get_pseudo_lr(jnp.asarray(sr), jnp.asarray(kvec), k, sf)

    # reference loop (sr_loss_functions.py:84-101): conv stride 1 then
    # torchvision bicubic resize (antialias False in the pinned version)
    kern = kvec / kvec.sum(axis=1, keepdims=True)
    weight = torch.from_numpy(kern.reshape(b, 1, k, k))
    srt = torch.from_numpy(sr.transpose(0, 3, 1, 2))
    outs = []
    for i in range(b):
        w = weight[i].expand(3, 1, k, k)
        t = F.conv2d(srt[i : i + 1], w, padding=(k - 1) // 2, groups=3)
        t = F.interpolate(t, (hw // sf, hw // sf), mode="bicubic", align_corners=False)
        outs.append(t)
    ref = torch.cat(outs, 0).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(lr), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(k2d), kern.reshape(b, k, k), rtol=1e-5)


def test_kbpn_loss_composition(rng):
    b, hw, k, sf = 2, 32, 7, 4
    hr_pred = rng.rand(b, hw, hw, 3).astype(np.float32)
    hr_tgt = rng.rand(b, hw, hw, 3).astype(np.float32)
    lr_tgt = rng.rand(b, hw // sf, hw // sf, 3).astype(np.float32)
    kvec = rng.rand(b, k * k).astype(np.float32)
    gt_k = rng.rand(b, k, k).astype(np.float32)
    loss, k2d = kbpn_loss(
        jnp.asarray(hr_pred), jnp.asarray(hr_tgt), jnp.asarray(lr_tgt),
        jnp.asarray(kvec), jnp.asarray(gt_k), 100,
        ksize=k, scale_factor=sf, weights=(0.4, 0.4, 0.2),
    )
    lr_pred, kern = get_pseudo_lr(jnp.asarray(hr_pred), jnp.asarray(kvec), k, sf)
    expected = (
        0.4 * np.abs(hr_pred - hr_tgt).mean(axis=(1, 2, 3))
        + 0.4 * np.abs(np.asarray(lr_pred) - lr_tgt).mean(axis=(1, 2, 3))
        + 0.2 * ((np.asarray(kern) - gt_k) ** 2).mean(axis=(1, 2))
    )
    np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-4)


def test_psnr_matches_formula(rng):
    a = rng.rand(3, 16, 16, 3).astype(np.float32)
    b = rng.rand(3, 16, 16, 3).astype(np.float32)
    ours = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    mse = ((a - b) ** 2).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(ours, 10 * np.log10(1 / mse), rtol=1e-4)


def test_ssim_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from math import exp

    img1 = rng.rand(2, 32, 32, 3).astype(np.float32)
    img2 = np.clip(img1 + 0.05 * rng.randn(2, 32, 32, 3).astype(np.float32), 0, 1)
    ours = np.asarray(ssim(jnp.asarray(img1), jnp.asarray(img2)))

    # reference SSIM (estimate_metrics.py:134-201)
    def gaussian(ws, sigma):
        g = torch.Tensor([exp(-((x - ws // 2) ** 2) / float(2 * sigma**2)) for x in range(ws)])
        return g / g.sum()

    ws, ch = 11, 3
    _1d = gaussian(ws, 1.5).unsqueeze(1)
    w = _1d.mm(_1d.t()).float().unsqueeze(0).unsqueeze(0).expand(ch, 1, ws, ws).contiguous()
    t1 = torch.from_numpy(img1.transpose(0, 3, 1, 2))
    t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2))
    mu1 = F.conv2d(t1, w, padding=ws // 2, groups=ch)
    mu2 = F.conv2d(t2, w, padding=ws // 2, groups=ch)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(t1 * t1, w, padding=ws // 2, groups=ch) - mu1_sq
    s2 = F.conv2d(t2 * t2, w, padding=ws // 2, groups=ch) - mu2_sq
    s12 = F.conv2d(t1 * t2, w, padding=ws // 2, groups=ch) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    ref = smap.mean(1).mean(1).mean(1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_iou_thresholds_matches_reference(rng):
    out = rng.rand(2, 20, 20, 1).astype(np.float32)
    tgt = (rng.rand(2, 20, 20, 1) > 0.6).astype(np.float32)
    ths = np.linspace(0.01, 0.99, 99).astype(np.float32)
    ours = np.asarray(iou_thresholds(jnp.asarray(out), jnp.asarray(tgt), jnp.asarray(ths)))
    # reference (estimate_metrics.py:72-84 + inference.py:111)
    ob = out[:, :, :, 0][:, None] > ths[None, :, None, None]
    tb = np.broadcast_to(tgt[:, :, :, 0][:, None] > 0.5, ob.shape)
    inter = (ob & tb).sum(axis=(2, 3))
    union = (ob | tb).sum(axis=(2, 3))
    ref = (inter + 1e-5) / (union + 1e-5)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_surface_distance_known_values():
    # two unit squares 3 px apart: all surface distances equal 3 along x
    gt = np.zeros((16, 16), bool)
    pred = np.zeros((16, 16), bool)
    gt[8, 4] = True
    pred[8, 7] = True
    sd = compute_surface_distances(gt, pred)
    assert sd["distances_gt_to_pred"].size > 0
    hd = compute_robust_hausdorff(sd, 100)
    assert 2.0 <= hd <= 3.2  # contour elements sit at subpixel corners
    # identical masks -> distance 0
    sd2 = compute_surface_distances(gt, gt)
    assert compute_robust_hausdorff(sd2, 100) == 0.0


def test_calc_distance_metrics_outliers():
    preds = np.zeros((1, 2, 8, 8), bool)
    gts = np.zeros((1, 1, 8, 8), bool)
    gts[0, 0, 4, 4] = True
    preds[0, 1, 4, 4] = True
    hd, msd = calc_distance_metrics(preds, gts)
    assert hd[0, 0] == 8  # one-empty -> max image side
    assert hd[0, 1] == 0.0
    assert msd[0, 0] == 8


def test_hausdorff_distance_matches_scipy(rng):
    """Device HD vs a scipy transcription of estimate_metrics.py:205-232."""
    from scipy.ndimage import distance_transform_edt as scipy_edt

    from csbsr_tpu.metrics.device_metrics import hausdorff_distance

    pred = rng.rand(3, 24, 24) > 0.8
    tgt = rng.rand(3, 24, 24) > 0.8
    pred[2] = False  # empty mask -> Inf

    def ref_hd(x, y):
        if not x.any() or not y.any():
            return np.inf
        d = scipy_edt(np.logical_not(y))
        return d[np.nonzero(x)].max()

    expected = np.array([max(ref_hd(pred[i], tgt[i]), ref_hd(tgt[i], pred[i]))
                         for i in range(3)])
    got = np.asarray(hausdorff_distance(jnp.asarray(pred), jnp.asarray(tgt)))
    assert np.isinf(got[2]) and np.isinf(expected[2])
    np.testing.assert_allclose(got[:2], expected[:2], rtol=1e-5)


def test_psnr_compare_cli(tmp_path, capsys):
    """tools/psnr_compare.py = the reference's estimate_metrics.py:362-387 /
    psnr_ssim.py:243-265 folder-compare probes. Identical folders -> inf
    raw PSNR; matlab mode prints both averages."""
    import numpy as np
    from PIL import Image
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "psnr_compare", pathlib.Path(__file__).parents[1] / "tools" / "psnr_compare.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    a = tmp_path / "a"; b = tmp_path / "b"
    a.mkdir(); b.mkdir()
    r = np.random.RandomState(3)
    img = (r.rand(24, 24, 3) * 255).astype("uint8")
    Image.fromarray(img).save(a / "x.png")
    Image.fromarray(img).save(b / "x.png")

    mod.main([str(b), str(a)])
    out = capsys.readouterr().out
    assert "averaged psnr inf" in out

    mod.main([str(b), str(a), "--matlab", "--crop_border", "0"])
    out = capsys.readouterr().out
    assert "averaged ssim 1.0" in out
