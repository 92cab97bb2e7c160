"""Offline test-set degradation generator.

Rebuild of `/root/reference/model/data/blur/make_test_blur.py:24-96`: for
each HR image, draw one anisotropic Gaussian kernel (sigma in [0.2, 4.0]^2,
k=21), write <out>/kernels/<name>.png (max-normalised 8-bit), the blurred HR
to <out>/hr_images/ and the clipped bicubic /4 LR to <out>/lr_images/ -
the layout CrackDataSetTest consumes.

Usage: python -m csbsr_tpu.data.make_test_blur <hr_dir> <output_dir>
       [--glob '*.jpg'] [--seed 5] [--kernel-size 21] [--scale 4]
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def make_test_blur_dir(
    dataset_dir: str,
    output_dir: str,
    pattern: str = "*.jpg",
    seed: int = 5,
    kernel_size: int = 21,
    scale_factor: int = 4,
    sigma_range=(0.2, 4.0),
):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..ops.blur import gaussian_kernels, batch_blur
    from ..ops.resize import resize

    fnames = sorted(p.name for p in Path(dataset_dir).glob(pattern))
    assert fnames, f"no {pattern} images under {dataset_dir}"
    for sub in ("kernels", "hr_images", "lr_images"):
        os.makedirs(os.path.join(output_dir, sub), exist_ok=True)

    key = jax.random.PRNGKey(seed)
    for i, fname in enumerate(fnames):
        img = np.asarray(Image.open(os.path.join(dataset_dir, fname))).astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        k = gaussian_kernels(
            jax.random.fold_in(key, i), 1, kernel_size, sigma_range,
            isotropic=False,
        )
        hr = jnp.asarray(img)[None]
        hr_blur = batch_blur(hr, k, stride=1)
        h, w = hr_blur.shape[1:3]
        lr = jnp.clip(
            resize(hr_blur, (int(h / scale_factor), int(w / scale_factor)), method="bicubic"),
            0.0, 1.0,
        )

        out_name = fname.replace("jpg", "png")
        kern = np.asarray(k[0])
        kern8 = (np.clip(kern / kern.max(), 0, 1) * 255).round().astype(np.uint8)
        Image.fromarray(kern8, "L").save(os.path.join(output_dir, "kernels", out_name))
        for sub, arr in (("hr_images", hr_blur[0]), ("lr_images", lr[0])):
            a8 = (np.clip(np.asarray(arr), 0, 1) * 255).round().astype(np.uint8)
            Image.fromarray(a8, "RGB").save(os.path.join(output_dir, sub, out_name))
    return len(fnames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset_dir")
    p.add_argument("output_dir")
    p.add_argument("--glob", default="*.jpg")
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--kernel-size", type=int, default=21)
    p.add_argument("--scale", type=int, default=4)
    args = p.parse_args()
    n = make_test_blur_dir(
        args.dataset_dir, args.output_dir, args.glob, args.seed,
        args.kernel_size, args.scale,
    )
    print(f"degraded {n} images -> {args.output_dir}")


if __name__ == "__main__":
    main()
