"""Folder-compare PSNR/SSIM CLI.

Rebuild of the reference's two standalone `__main__` probes:
  - `model/utils/estimate_metrics.py:362-387` — raw PSNR over paired
    folders ([0,1] scaling, 10*log10(1/MSE));
  - `model/utils/metrics/psnr_ssim.py:243-265` — BasicSR/Matlab-parity
    `calculate_psnr/ssim` with a crop border (reference hard-codes 4 and
    its own paths; here both are flags).

Usage:
    python tools/psnr_compare.py TEST_DIR GT_DIR [--matlab]
        [--crop_border 4] [--y_channel]

Files are paired by sorted order, like the reference's glob zip.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("test_dir")
    ap.add_argument("gt_dir")
    ap.add_argument("--matlab", action="store_true",
                    help="BasicSR/Matlab-parity metrics (psnr_ssim.py probe) "
                         "instead of the raw [0,1] PSNR (estimate_metrics.py probe)")
    ap.add_argument("--crop_border", type=int, default=4)
    ap.add_argument("--y_channel", action="store_true")
    args = ap.parse_args(argv)

    test_files = sorted(glob.glob(os.path.join(args.test_dir, "*")))
    gt_files = sorted(glob.glob(os.path.join(args.gt_dir, "*")))
    if not test_files or len(test_files) != len(gt_files):
        raise SystemExit(
            f"folder mismatch: {len(test_files)} test vs {len(gt_files)} gt files")

    sum_psnr = sum_ssim = 0.0
    for test_file, gt_file in zip(test_files, gt_files):
        test_image = np.array(Image.open(test_file))
        gt_image = np.array(Image.open(gt_file))
        if args.matlab:
            from csbsr_tpu.metrics.matlab import calculate_psnr, calculate_ssim

            sum_psnr += calculate_psnr(test_image, gt_image, args.crop_border,
                                       args.y_channel)
            sum_ssim += calculate_ssim(test_image, gt_image, args.crop_border,
                                       args.y_channel)
        else:
            # estimate_metrics.PSNR(standardized=False): [0,255] -> [0,1]
            a = test_image.astype(np.float64) / 255.0
            b = gt_image.astype(np.float64) / 255.0
            mse = np.mean((a - b) ** 2)
            sum_psnr += float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)

    n = len(test_files)
    print(args.test_dir)
    print("averaged psnr {}".format(sum_psnr / n))
    if args.matlab:
        print("averaged ssim {}".format(sum_ssim / n))


if __name__ == "__main__":
    main()
