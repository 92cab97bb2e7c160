"""Golden tests for the PhotometricDistort family.

Reference behavior: `/root/reference/model/data/transforms/transforms.py:250-416`
(RandomContrast/Saturation/Value/Hue/Brightness, LightingNoise, SwapChannels,
ConvertColor, PhotometricDistort). Each op is checked against the formula with
a fixed rng; ConvertColor against cv2 directly.
"""
import numpy as np
import pytest

from csbsr_tpu.data.transforms import (
    ConvertColor,
    PhotometricDistort,
    RandomBrightness,
    RandomContrast,
    RandomHue,
    RandomLightingNoise,
    RandomSaturation,
    RandomValue,
    SwapChannels,
    TrainTransforms,
)

# whole-file quick tier: op/util-level tests, no large jit graphs
pytestmark = pytest.mark.quick


def _img(rng, h=8, w=8, c=3, scale=255.0):
    return (rng.rand(h, w, c) * scale).astype(np.float32)


def test_random_contrast_golden():
    rng = np.random.RandomState(0)
    img = _img(np.random.RandomState(3))
    # replicate the draw order: randint(2) then uniform(lower, upper)
    r2 = np.random.RandomState(0)
    flip = r2.randint(2)
    expected = img.copy()
    if flip:
        expected = expected * r2.uniform(0.5, 1.5)
    expected = np.clip(expected, 0, 255)
    out, _ = RandomContrast()(img.copy(), None, rng)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_random_brightness_golden():
    # seed chosen so the first randint(2) is 1 (the op fires)
    seed = next(s for s in range(10) if np.random.RandomState(s).randint(2) == 1)
    img = _img(np.random.RandomState(4))
    r2 = np.random.RandomState(seed)
    r2.randint(2)
    expected = np.clip(img + r2.uniform(-32, 32), 0, 255)
    out, _ = RandomBrightness()(img.copy(), None, np.random.RandomState(seed))
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_saturation_value_channel_targets():
    seed = next(s for s in range(10) if np.random.RandomState(s).randint(2) == 1)
    img = _img(np.random.RandomState(5), scale=1.0)
    out, _ = RandomSaturation(2.0, 2.0)(img.copy(), None, np.random.RandomState(seed))
    np.testing.assert_allclose(out[:, :, 1], np.clip(img[:, :, 1] * 2.0, 0, 255), rtol=1e-6)
    np.testing.assert_allclose(out[:, :, 0], img[:, :, 0])
    out, _ = RandomValue(2.0, 2.0)(img.copy(), None, np.random.RandomState(seed))
    np.testing.assert_allclose(out[:, :, 2], np.clip(img[:, :, 2] * 2.0, 0, 255), rtol=1e-6)


def test_random_hue_wraps_mod_180():
    seed = next(s for s in range(10) if np.random.RandomState(s).randint(2) == 1)
    img = _img(np.random.RandomState(6), scale=179.0)
    r2 = np.random.RandomState(seed)
    r2.randint(2)
    delta = r2.uniform(-18, 18)
    out, _ = RandomHue()(img.copy(), None, np.random.RandomState(seed))
    np.testing.assert_allclose(out[:, :, 0], (img[:, :, 0] + delta) % 180, rtol=1e-5)
    assert (out[:, :, 0] < 180).all() and (out[:, :, 0] >= 0).all()


def test_convert_color_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = _img(np.random.RandomState(7))
    out, _ = ConvertColor("RGB", "HSV")(img, None)
    np.testing.assert_allclose(out, cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    back, _ = ConvertColor("HSV", "RGB")(out, None)
    np.testing.assert_allclose(back, cv2.cvtColor(out, cv2.COLOR_HSV2RGB))


def test_swap_channels_and_lighting_noise():
    img = _img(np.random.RandomState(8))
    sw = SwapChannels((2, 0, 1))(img)
    np.testing.assert_array_equal(sw[:, :, 0], img[:, :, 2])
    seed = next(s for s in range(20) if np.random.RandomState(s).randint(2) == 1)
    out, _ = RandomLightingNoise()(img, None, np.random.RandomState(seed))
    # output is a channel permutation: per-pixel sorted values are unchanged
    np.testing.assert_allclose(np.sort(out, axis=2), np.sort(img, axis=2))


def test_photometric_distort_pipeline_and_config():
    pytest.importorskip("cv2")
    rng = np.random.RandomState(11)
    img = _img(np.random.RandomState(9))
    out, mask = PhotometricDistort()(img, np.zeros((8, 8, 1)), rng)
    assert out.shape == img.shape and np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 255 + 1e-4

    # a reference YAML naming PhotometricDistort loads and runs end to end
    from csbsr_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.INPUT.IMAGE_SIZE = [16, 16]
    cfg.DATASET.DATA_AUGMENTATION = [
        ["ConvertFromInts"],
        ["PhotometricDistort"],
        ["RandomMirror"],
        ["RandomCrop"],
        ["ToTensor"],
    ]
    tt = TrainTransforms(cfg)
    im, mk = tt(
        (np.random.RandomState(10).rand(32, 32, 3) * 255).astype(np.uint8),
        (np.random.RandomState(12).rand(32, 32, 1) * 255).astype(np.uint8),
        np.random.RandomState(13),
    )
    assert im.shape == (16, 16, 3) and mk.shape == (16, 16, 1)
    assert 0 <= im.min() and im.max() <= 1.0
