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


_REGISTRY = {
    "ConvertFromInts": ConvertFromInts,
    "ToTensor": ToTensor,
    "RandomMirror": RandomMirror,
    "RandomVerticalFlip": RandomVerticalFlip,
    "RandomCrop": RandomCrop,
    "RandomResizedCrop": RandomResizedCrop,
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
