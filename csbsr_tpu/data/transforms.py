"""Pairwise (image, mask) transforms - numpy host-side.

Rebuild of the used subset of
`/root/reference/model/data/transforms/transforms.py` +
`data_preprocess.py:13-60` (the vestigial SSD/CenterNet transforms are out of
scope).  Transforms run on uint8/float numpy HWC arrays in the loader
workers; everything device-side (degradation, normalisation) lives in ops/.

TrainTransforms builds the pipeline from cfg.DATASET.DATA_AUGMENTATION via a
registry (the reference uses `eval()` on config strings,
`data_preprocess.py:17-28` - we keep the config format but not the eval).
Outputs are float32 in [0,1].
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img, mask, rng):
        for t in self.transforms:
            img, mask = t(img, mask, rng)
        return img, mask


class ConvertFromInts:
    def __call__(self, img, mask, rng):
        img = img.astype(np.float32)
        mask = mask.astype(np.float32) if mask is not None else None
        return img, mask


class ToTensor:
    """No-op in the numpy pipeline (layout stays HWC); kept for config parity."""

    def __call__(self, img, mask, rng):
        return img, mask


class RandomMirror:
    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img[:, ::-1].copy()
            if mask is not None:
                mask = mask[:, ::-1].copy()
        return img, mask


class RandomVerticalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img, mask, rng):
        if rng.rand() < self.p:
            img = img[::-1].copy()
            if mask is not None:
                mask = mask[::-1].copy()
        return img, mask


class RandomCrop:
    """torchvision RandomCrop semantics at fixed size (transforms.py:534-549)."""

    def __init__(self, size):
        self.size = size  # (H, W)

    def __call__(self, img, mask, rng):
        th, tw = self.size
        h, w = img.shape[:2]
        if h < th or w < tw:  # pad-to-fit (torchvision pads; crack data never hits this)
            ph, pw = max(th - h, 0), max(tw - w, 0)
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)))
            if mask is not None:
                mask = np.pad(mask, ((0, ph), (0, pw), (0, 0)))
            h, w = img.shape[:2]
        i = rng.randint(0, h - th + 1)
        j = rng.randint(0, w - tw + 1)
        img = img[i : i + th, j : j + tw]
        if mask is not None:
            mask = mask[i : i + th, j : j + tw]
        return img, mask


class RandomResizedCrop:
    """torchvision RandomResizedCrop with scale/ratio (transforms.py:607-...).

    With scale=(1,1), ratio=(1,1) (the default recipe) this degenerates to a
    full-image resize to `size`.
    """

    def __init__(self, size, scale=(1.0, 1.0), ratio=(1.0, 1.0)):
        self.size = size
        self.scale = scale
        self.ratio = ratio

    def __call__(self, img, mask, rng):
        import cv2

        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = area * rng.uniform(*self.scale)
            aspect = np.exp(rng.uniform(np.log(self.ratio[0]), np.log(self.ratio[1])))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = rng.randint(0, h - ch + 1)
                j = rng.randint(0, w - cw + 1)
                img_c = img[i : i + ch, j : j + cw]
                mask_c = mask[i : i + ch, j : j + cw] if mask is not None else None
                break
        else:
            img_c, mask_c = img, mask
        th, tw = self.size
        img = cv2.resize(img_c, (tw, th), interpolation=cv2.INTER_LINEAR)
        if img.ndim == 2:
            img = img[:, :, None]
        if mask_c is not None:
            mask = cv2.resize(mask_c, (tw, th), interpolation=cv2.INTER_LINEAR)
            if mask.ndim == 2:
                mask = mask[:, :, None]
        return img, mask


def image_clipping(image):
    """Clip to the pre-normalisation [0, 255] range (transforms.py:37-42)."""
    return np.clip(image, 0, 255)


class RandomContrast:
    """transforms.py:329-341: x *= U(lower, upper) with prob 1/2, clipped."""

    def __init__(self, lower=0.5, upper=1.5):
        assert upper >= lower >= 0
        self.lower, self.upper = lower, upper

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img * rng.uniform(self.lower, self.upper)
        return image_clipping(img), mask


class RandomBrightness:
    """transforms.py:344-354: x += U(-delta, delta) with prob 1/2, clipped."""

    def __init__(self, delta=32):
        assert 0.0 <= delta <= 255.0
        self.delta = delta

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img + rng.uniform(-self.delta, self.delta)
        return image_clipping(img), mask


class RandomSaturation:
    """transforms.py:250-261: HSV S-channel *= U(lower, upper) with prob 1/2."""

    def __init__(self, lower=0.5, upper=1.5):
        assert upper >= lower >= 0
        self.lower, self.upper = lower, upper

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img.copy()
            img[:, :, 1] *= rng.uniform(self.lower, self.upper)
        return image_clipping(img), mask


class RandomValue:
    """transforms.py:264-275: HSV V-channel *= U(lower, upper) with prob 1/2."""

    def __init__(self, lower=0.5, upper=1.5):
        assert upper >= lower >= 0
        self.lower, self.upper = lower, upper

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img.copy()
            img[:, :, 2] *= rng.uniform(self.lower, self.upper)
        return image_clipping(img), mask


class RandomHue:
    """transforms.py:278-287: HSV H-channel += U(-delta, delta), wrapped
    mod 180 (the reference keeps cv2's uint8 H convention even though the
    float pipeline yields H in [0, 360) - behavior preserved)."""

    def __init__(self, delta=18.0):
        assert 0.0 <= delta <= 180.0
        self.delta = delta

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            img = img.copy()
            img[:, :, 0] += rng.uniform(-self.delta, self.delta)
            img[:, :, 0] = img[:, :, 0] % 180
        return img, mask


class SwapChannels:
    """transforms.py:369-390."""

    def __init__(self, swaps):
        self.swaps = swaps

    def __call__(self, img):
        return img[:, :, self.swaps]


class RandomLightingNoise:
    """transforms.py:292-303: random channel permutation with prob 1/2."""

    PERMS = ((0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0))

    def __call__(self, img, mask, rng):
        if rng.randint(2):
            swap = self.PERMS[rng.randint(len(self.PERMS))]
            img = SwapChannels(swap)(img)
        return img, mask


class ConvertColor:
    """transforms.py:306-326: cv2 color-space conversion (on float arrays,
    matching the reference's post-ConvertFromInts float pipeline)."""

    def __init__(self, current, transform):
        self.current, self.transform = current, transform

    def __call__(self, img, mask, rng=None):
        import cv2

        pair = (self.current, self.transform)
        codes = {
            ("BGR", "HSV"): cv2.COLOR_BGR2HSV,
            ("RGB", "HSV"): cv2.COLOR_RGB2HSV,
            ("BGR", "RGB"): cv2.COLOR_BGR2RGB,
            ("HSV", "BGR"): cv2.COLOR_HSV2BGR,
            ("HSV", "RGB"): cv2.COLOR_HSV2RGB,
        }
        if pair not in codes:
            raise NotImplementedError(pair)
        return cv2.cvtColor(img, codes[pair]), mask


class PhotometricDistort:
    """transforms.py:393-416: brightness -> (contrast-first or contrast-last)
    HSV saturation/value/hue chain -> lighting noise. Same draw order as the
    reference so a seeded run is reproducible."""

    def __init__(self):
        self.pmd = [
            RandomContrast(),
            ConvertColor(current="RGB", transform="HSV"),
            RandomSaturation(),
            RandomValue(),
            RandomHue(),
            ConvertColor(current="HSV", transform="RGB"),
            RandomContrast(),
        ]
        self.rand_brightness = RandomBrightness()
        self.rand_light_noise = RandomLightingNoise()

    def __call__(self, img, mask, rng):
        img = np.ascontiguousarray(img, dtype=np.float32).copy()
        img, mask = self.rand_brightness(img, mask, rng)
        chain = self.pmd[:-1] if rng.randint(2) else self.pmd[1:]
        for t in chain:
            img, mask = t(img, mask, rng)
        return self.rand_light_noise(img, mask, rng)


_REGISTRY = {
    "ConvertFromInts": ConvertFromInts,
    "ToTensor": ToTensor,
    "RandomMirror": RandomMirror,
    "RandomVerticalFlip": RandomVerticalFlip,
    "RandomCrop": RandomCrop,
    "RandomResizedCrop": RandomResizedCrop,
    "PhotometricDistort": PhotometricDistort,
    "RandomContrast": RandomContrast,
    "RandomBrightness": RandomBrightness,
    "RandomSaturation": RandomSaturation,
    "RandomValue": RandomValue,
    "RandomHue": RandomHue,
    "RandomLightingNoise": RandomLightingNoise,
}


class TrainTransforms:
    """data_preprocess.py:13-46: config-driven pipeline, /255 at the end."""

    def __init__(self, cfg):
        comp = []
        size = tuple(cfg.INPUT.IMAGE_SIZE)
        for entry in cfg.DATASET.DATA_AUGMENTATION:
            func, args = entry[0], entry[1] if len(entry) > 1 else None
            cls = _REGISTRY[func]
            if func == "RandomResizedCrop":
                kw = args[0] if isinstance(args, list) else (args or {})
                kw = {k: tuple(v) if isinstance(v, (list, tuple)) else v for k, v in dict(kw).items()}
                comp.append(cls(size, **kw))
            elif func == "RandomCrop":
                comp.append(cls(size))
            elif func == "RandomVerticalFlip" and args not in (None, "None"):
                p = args["p"] if isinstance(args, dict) else float(args)
                comp.append(cls(p=p))
            else:
                comp.append(cls())
        self.augment = Compose(comp)

    def __call__(self, image, mask, rng):
        image, mask = self.augment(image, mask, rng)
        image = image / 255.0
        mask = mask / 255.0 if mask is not None else None
        return image, mask


class TestTransforms:
    """data_preprocess.py:48-60: ConvertFromInts + /255."""

    def __init__(self, cfg=None):
        pass

    def __call__(self, image, mask, rng=None):
        image = image.astype(np.float32) / 255.0
        mask = mask.astype(np.float32) / 255.0 if mask is not None else None
        return image, mask
