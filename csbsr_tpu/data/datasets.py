"""Datasets: crack segmentation train/test, SR pretrain, synthetic fallback.

Rebuild of `/root/reference/model/data/crack_dataset.py`.  Differences by
design (TPU-first):
  - The train dataset returns (hr, seg) only; blur synthesis + bicubic
    downsampling run ON DEVICE inside the jitted step (ops.blur.degrade),
    removing the reference's worker-side CUDA round trip
    (`crack_dataset.py:51-62`).  A host-side fallback path exists for
    BLUR.FLAG=False parity.
  - A deterministic synthetic dataset stands in when the khanhha data is not
    on disk (tests, benches).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .transforms import TrainTransforms, TestTransforms
from ..ops.patch import split_patch


def _imread(path) -> np.ndarray:
    from PIL import Image

    arr = np.array(Image.open(path))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


class CrackDataSet:
    """Train dataset (`crack_dataset.py:28-68`): jpg image + same-name mask."""

    def __init__(self, cfg, image_dir, seg_dir, transforms: TrainTransforms):
        self.image_dir = image_dir
        self.seg_dir = seg_dir
        self.fnames: List[str] = sorted(p.name for p in Path(image_dir).glob("*.jpg"))
        self.transforms = transforms

    def __len__(self):
        return len(self.fnames)

    def get(self, i: int, rng: np.random.RandomState):
        fname = self.fnames[i]
        img = _imread(os.path.join(self.image_dir, fname))
        seg = _imread(os.path.join(self.seg_dir, fname))[:, :, :1]
        img, seg = self.transforms(img, seg, rng)
        return img.astype(np.float32), seg.astype(np.float32)


class SyntheticCrackDataSet:
    """Deterministic stand-in with crack-like curvy structures."""

    def __init__(self, cfg, size: int = 64, image_hw: Tuple[int, int] = (224, 224)):
        self.size = size
        self.hw = tuple(image_hw)

    def __len__(self):
        return self.size

    def get(self, i: int, rng: np.random.RandomState):
        h, w = self.hw
        local = np.random.RandomState(i * 9973 + 11)
        img = local.rand(h, w, 3).astype(np.float32) * 0.3 + 0.4
        seg = np.zeros((h, w, 1), np.float32)
        # draw a few random polylines as "cracks"
        for _ in range(3):
            x, y = local.randint(0, w), local.randint(0, h)
            dx, dy = local.randn(2)
            for _ in range(200):
                xi, yi = int(x) % w, int(y) % h
                seg[max(yi - 1, 0) : yi + 2, max(xi - 1, 0) : xi + 2, 0] = 1.0
                img[max(yi - 1, 0) : yi + 2, max(xi - 1, 0) : xi + 2] *= 0.35
                dx += 0.3 * local.randn()
                dy += 0.3 * local.randn()
                n = max(np.hypot(dx, dy), 1e-6)
                x += dx / n
                y += dy / n
        return img, seg


class CrackDataSetTest:
    """Test dataset (`crack_dataset.py:71-142`): precomputed blurred LR +
    GT kernel under <blur_dir>/<name>/{lr_images,kernels}; patches the LR.
    """

    def __init__(self, cfg, image_dir, seg_dir, blur_dir, blur_name):
        self.gt_image_dir = image_dir
        self.gt_seg_dir = seg_dir
        self.gt_blur_dir = os.path.join(blur_dir, blur_name, "kernels")
        self.input_image_dir = os.path.join(blur_dir, blur_name, "lr_images")
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.jpg"))
        self.transforms = TestTransforms(cfg)
        self.scale_factor = cfg.MODEL.SCALE_FACTOR
        self.patch_h, self.patch_w = [int(i / self.scale_factor) for i in cfg.INPUT.IMAGE_SIZE]

    def __len__(self):
        return len(self.fnames)

    def get(self, i: int):
        fname = self.fnames[i]
        sr_target = _imread(os.path.join(self.gt_image_dir, fname))
        seg_target = _imread(os.path.join(self.gt_seg_dir, fname))[:, :, :1]
        sr_target, seg_target = self.transforms(sr_target, seg_target)

        kname = fname.replace("jpg", "png")
        kernel = _imread(os.path.join(self.gt_blur_dir, kname)).astype(np.float32) / 255.0
        kernel = kernel[:, :, 0]
        kernel = kernel / kernel.sum()

        if self.scale_factor != 1:
            lr = _imread(os.path.join(self.input_image_dir, kname))
            lr, _ = self.transforms(lr, None)
        else:
            lr = sr_target

        patches, ushape = split_patch(lr, self.patch_h, self.patch_w)
        ushape = np.asarray(ushape).copy()
        ushape[[5, 6]] = ushape[[5, 6]] * self.scale_factor
        seg_ushape = ushape.copy()
        seg_ushape[4] = 1
        num_patch = int(ushape[2] * ushape[3])
        kernels = np.broadcast_to(kernel, (num_patch, *kernel.shape)).copy()
        return (
            np.asarray(patches, np.float32),
            sr_target.astype(np.float32),
            seg_target.astype(np.float32),
            kernels.astype(np.float32),
            fname,
            ushape,
            seg_ushape,
        )


class RetinalDataSet:
    """Retinal-vessel domain (`retinal_dataset.py:28-60`): png pairs, mask
    values scaled x255 before the /255 transform (i.e. kept binary)."""

    def __init__(self, cfg, image_dir, seg_dir, transforms: TrainTransforms):
        self.image_dir = image_dir
        self.seg_dir = seg_dir
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.png"))
        self.transforms = transforms

    def __len__(self):
        return len(self.fnames)

    def get(self, i, rng):
        fname = self.fnames[i]
        img = _imread(os.path.join(self.image_dir, fname))
        seg = _imread(os.path.join(self.seg_dir, fname))[:, :, :1] * 255
        img, seg = self.transforms(img, seg, rng)
        return img.astype(np.float32), seg.astype(np.float32)


class MassRoadDataset:
    """Massachusetts-roads domain (`ms_road_dataset.py:28-60`): png pairs."""

    def __init__(self, cfg, image_dir, seg_dir, transforms: TrainTransforms):
        self.image_dir = image_dir
        self.seg_dir = seg_dir
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.png"))
        self.transforms = transforms

    def __len__(self):
        return len(self.fnames)

    def get(self, i, rng):
        fname = self.fnames[i]
        img = _imread(os.path.join(self.image_dir, fname))
        seg = _imread(os.path.join(self.seg_dir, fname))[:, :, :1]
        img, seg = self.transforms(img, seg, rng)
        return img.astype(np.float32), seg.astype(np.float32)


class SubsetView:
    """Index-restricted view of a train dataset (reference random_splits 95/5
    with torch.utils.data.random_split, `train.py:52-57`; this is the JAX-side
    equivalent over explicit seeded indices)."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def get(self, i, rng=None):
        return self.dataset.get(self.indices[i], rng)


class RetinalDataSetTest:
    """Retinal test set (`retinal_dataset.py:70-126`): png pairs, mask values
    scaled x255 (kept binary after /255), precomputed LR + kernel like
    CrackDataSetTest."""

    def __init__(self, cfg, image_dir, seg_dir, blur_dir, blur_name):
        self.gt_image_dir = image_dir
        self.gt_seg_dir = seg_dir
        self.gt_blur_dir = os.path.join(blur_dir, blur_name, "kernels")
        self.input_image_dir = os.path.join(blur_dir, blur_name, "lr_images")
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.png"))
        self.transforms = TestTransforms(cfg)
        self.scale_factor = cfg.MODEL.SCALE_FACTOR
        self.seg_ch = cfg.MODEL.NUM_CLASSES
        self.patch_h, self.patch_w = [int(i / self.scale_factor) for i in cfg.INPUT.IMAGE_SIZE]

    def __len__(self):
        return len(self.fnames)

    def get(self, i: int):
        fname = self.fnames[i]
        sr_target = _imread(os.path.join(self.gt_image_dir, fname))
        seg_target = _imread(os.path.join(self.gt_seg_dir, fname))[:, :, :1] * 255
        sr_target, seg_target = self.transforms(sr_target, seg_target)

        kernel = _imread(os.path.join(self.gt_blur_dir, fname)).astype(np.float32) / 255.0
        kernel = kernel[:, :, 0]
        kernel = kernel / kernel.sum()

        if self.scale_factor != 1:
            lr = _imread(os.path.join(self.input_image_dir, fname))
            lr, _ = self.transforms(lr, None)
        else:
            lr = sr_target

        patches, ushape = split_patch(lr, self.patch_h, self.patch_w)
        ushape = np.asarray(ushape).copy()
        ushape[[5, 6]] = ushape[[5, 6]] * self.scale_factor
        seg_ushape = ushape.copy()
        seg_ushape[[1, 4]] = self.seg_ch
        num_patch = int(ushape[2] * ushape[3])
        kernels = np.broadcast_to(kernel, (num_patch, *kernel.shape)).copy()
        return (
            np.asarray(patches, np.float32),
            sr_target.astype(np.float32),
            seg_target.astype(np.float32),
            kernels.astype(np.float32),
            fname,
            ushape,
            seg_ushape,
        )


class TTICrackDataSetTest:
    """Unlabeled real-image test set (`crack_dataset.py:145-172`): png only,
    patched for inference; no GT."""

    def __init__(self, cfg, image_dir):
        self.image_dir = image_dir
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.png"))
        self.transforms = TestTransforms(cfg)
        self.scale_factor = cfg.MODEL.SCALE_FACTOR
        self.patch_h, self.patch_w = list(cfg.INPUT.IMAGE_SIZE)

    def __len__(self):
        return len(self.fnames)

    def get(self, i):
        fname = self.fnames[i]
        img = _imread(os.path.join(self.image_dir, fname))
        img, _ = self.transforms(img, None)
        patches, ushape = split_patch(img, self.patch_h, self.patch_w)
        ushape = np.asarray(ushape).copy()
        ushape[[5, 6]] = ushape[[5, 6]] * self.scale_factor
        seg_ushape = ushape.copy()
        seg_ushape[4] = 1
        return np.asarray(patches, np.float32), fname, ushape, seg_ushape


class SRPretrainDataSet:
    """Image-only SR pretrain dataset (`crack_dataset.py:176-212`)."""

    def __init__(self, cfg, image_dir, transforms: TrainTransforms):
        self.image_dir = image_dir
        self.fnames = sorted(p.name for p in Path(image_dir).glob("*.png"))
        self.transforms = transforms

    def __len__(self):
        return len(self.fnames)

    def get(self, i: int, rng: np.random.RandomState):
        img = _imread(os.path.join(self.image_dir, self.fnames[i]))
        img, _ = self.transforms(img, None, rng)
        seg = np.zeros((*img.shape[:2], 1), np.float32)
        return img.astype(np.float32), seg
