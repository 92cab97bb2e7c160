"""Test-time inference harness.

Rebuild of `/root/reference/model/engine/inference.py` (inference_for_ss):
patched LR -> jitted model -> patch reassembly -> PSNR/SSIM/kernel-PSNR,
99-threshold binarisation -> IoU per threshold (AIU), optional HD/MSD via
the host surface-distance metric, mask/image/kernel dumps, iou_log.csv.

TPU-first: the patch axis is the batch axis (sharded over the mesh); the
99-threshold IoU is one broadcasted op on device; only the surface-distance
metric runs on host (eval-only, like the reference).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.device_metrics import psnr, ssim, iou_thresholds
from ..metrics.surface_distance import calc_distance_metrics
from ..ops.patch import joint_patch
from ..utils.save_output import save_img, save_mask, save_kernel


def build_infer_fn(cfg, model, variables):
    """Jitted patched forward: (patches) -> sr, seg, kernel_2d.

    Weights are a jit argument (closure capture would bake them into the HLO
    as constants - oversized compile payloads on remote backends).
    """
    ksize_out = int(cfg.BLUR.KERNEL_SIZE_OUTPUT)

    @jax.jit
    def _infer(variables, patches):
        outputs = model.apply(
            variables, patches, None, False, train=False, clip_sr=True
        )
        kvec = outputs["kernel"].astype(jnp.float32)
        kvec = kvec / jnp.sum(kvec, axis=-1, keepdims=True)
        k2d = kvec.reshape(-1, ksize_out, ksize_out)
        return outputs["sr"], outputs["seg"], k2d

    def infer(patches):
        # bucket the patch count to the next power of two: test images vary
        # in size, and without bucketing every new patch count recompiles
        n = patches.shape[0]
        bucket = 1 << (n - 1).bit_length()
        if bucket != n:
            pad = jnp.zeros((bucket - n, *patches.shape[1:]), patches.dtype)
            padded = jnp.concatenate([patches, pad], axis=0)
            sr, seg, k2d = _infer(variables, padded)
            return sr[:n], seg[:n], k2d[:n]
        return _infer(variables, patches)

    return infer


def inference_for_ss(
    cfg,
    model,
    variables,
    dataset,
    *,
    output_dir: str,
    test_aiu: bool = True,
    test_surface_distance: bool = False,
    test_classification_metrics: bool = False,
    save_images: bool = False,
    log_fn=print,
) -> Dict[str, float]:
    """Evaluate over a CrackDataSetTest-style dataset. Returns summary dict."""
    infer = build_infer_fn(cfg, model, variables)
    if test_aiu:
        thresholds = np.array([i * 0.01 for i in range(1, 100)], np.float32)
        save_idx = [0] + [9 + i * 10 for i in range(9)] + [98]
    else:
        thresholds = np.array([0.5], np.float32)
        save_idx = [0]
    th_dev = jnp.asarray(thresholds)

    fnames: List[str] = []
    psnr_scores, ssim_scores, kpsnr_scores = [], [], []
    aiu_rows, hd_rows, msd_rows = [], [], []
    acc_scores, sens_scores, spec_scores = [], [], []
    # the reference evaluates classification metrics at threshold index 49,
    # i.e. 0.50 (`inference.py:125-127`)
    cls_th = 0.5

    for i in range(len(dataset)):
        patches, sr_target, seg_target, kernels, fname, img_ushape, seg_ushape = dataset.get(i)
        fnames.append(fname)
        sr_p, seg_p, k2d = infer(jnp.asarray(patches))
        sr_pred = joint_patch(sr_p, img_ushape)  # (1, H, W, 3)
        seg_pred = joint_patch(seg_p, seg_ushape)  # (1, H, W, 1)
        sr_t = jnp.asarray(sr_target)[None]
        seg_t = jnp.asarray(seg_target)[None]

        if not cfg.MODEL.SR_SEG_INV and cfg.MODEL.SCALE_FACTOR != 1:
            sr_pred = jnp.clip(sr_pred, 0.0, 1.0)
            psnr_scores.append(float(psnr(sr_pred, sr_t)[0]))
            ssim_scores.append(float(ssim(sr_pred, sr_t)[0]))
            kp = jnp.clip(k2d[..., None], 0.0, 1.0)
            kt = jnp.clip(jnp.asarray(kernels)[..., None], 0.0, 1.0)
            kpsnr_scores.append(float(jnp.mean(psnr(kp, kt))))
            if save_images:
                save_img(output_dir, np.asarray(sr_pred), [fname])
                if cfg.MODEL.SR == "KBPN":
                    save_kernel(output_dir, np.asarray(k2d[:1]), [fname])
        else:
            psnr_scores.append(0.0)
            ssim_scores.append(0.0)
            kpsnr_scores.append(0.0)

        iou_scores = np.asarray(iou_thresholds(seg_pred, seg_t, th_dev))  # (1, T)
        aiu_rows.append(iou_scores[0])

        if save_images:
            seg_np = np.asarray(seg_pred)
            for idx in save_idx:
                save_mask(output_dir, (seg_np > thresholds[idx]).astype(np.float32), [fname], thresholds[idx])
            save_mask(output_dir, seg_np, [fname], -1)

        if test_classification_metrics:
            from ..metrics.retinal import get_retinal_seg_metrics

            pred_bi = (np.asarray(seg_pred[:, :, :, 0]) > cls_th).astype(np.int16)
            gt_bi = (np.asarray(seg_t[:, :, :, 0]) > 0.5).astype(np.int16)
            cls = get_retinal_seg_metrics(pred_bi, gt_bi)
            acc_scores.extend(np.atleast_1d(cls["acc"]))
            sens_scores.extend(np.atleast_1d(cls["sens"]))
            spec_scores.extend(np.atleast_1d(cls["spec"]))

        if test_surface_distance:
            seg_bi = np.asarray(seg_pred[:, :, :, 0])[:, None] > thresholds[:, None, None]
            seg_bi = np.moveaxis(seg_bi, 0, 1) if seg_bi.shape[0] != 1 else seg_bi
            gt_bi = np.asarray(seg_t[:, :, :, 0])[:, None] > 0.5
            hd, msd = calc_distance_metrics(seg_bi, gt_bi)
            hd_rows.append(hd[0])
            msd_rows.append(msd[0])

        if (i + 1) % 10 == 0:
            log_fn(f"estimation {(i+1)/len(dataset)*100:.1f} % finish! "
                   f"PSNR_mean:{np.mean(psnr_scores):.4f} SSIM_mean:{np.mean(ssim_scores):.4f} "
                   f"AIU_mean:{np.mean(aiu_rows):.4f}")

    aiu = np.stack(aiu_rows)  # (N, T)
    per_th = aiu.mean(axis=0)
    summary = {
        "PSNR": float(np.mean(psnr_scores)),
        "SSIM": float(np.mean(ssim_scores)),
        "PSNR_kernel": float(np.mean(kpsnr_scores)),
        "AIU": float(aiu.mean()),
        "IoU_max": float(per_th.max()),
        "IoU_max_threshold": float(thresholds[int(per_th.argmax())]),
    }
    if acc_scores:
        summary.update(
            Acc=float(np.mean(acc_scores)),
            Sens=float(np.mean(sens_scores)),
            Spec=float(np.mean(spec_scores)),
        )
    if hd_rows:
        ahd = np.stack(hd_rows)
        amsd = np.stack(msd_rows)
        summary.update(
            AHD=float(ahd.mean()), HD_min=float(ahd.mean(axis=0).min()),
            AMSD=float(amsd.mean()), MSD_min=float(amsd.mean(axis=0).min()),
        )
    log_fn("estimation finish!!")
    log_fn(
        f"PSNR_mean:{summary['PSNR']:.4f}  SSIM_mean:{summary['SSIM']:.4f} "
        f"PSNR(Kernel)_mean:{summary['PSNR_kernel']:.4f} AIU_mean:{summary['AIU']:.4f} "
        f"IoU_max:{summary['IoU_max']:.4f}"
    )
    save_iou_log(aiu, thresholds, fnames, output_dir)
    return summary


def inference_tti(
    cfg,
    model,
    variables,
    dataset,
    *,
    output_dir: str,
    max_patches_per_call: int = 6,
    log_fn=print,
):
    """Unlabeled real-image inference (`inference.py:210-251`,
    inference_tti_building): patched forward in chunks, dump SR images and
    raw + thresholded masks; no GT metrics."""
    infer = build_infer_fn(cfg, model, variables)
    thresholds = np.array([i * 0.01 for i in range(1, 100)], np.float32)
    save_idx = [0] + [9 + i * 10 for i in range(9)] + [98]

    for i in range(len(dataset)):
        patches, fname, img_ushape, seg_ushape = dataset.get(i)
        srs, segs = [], []
        for s in range(0, patches.shape[0], max_patches_per_call):
            sr_p, seg_p, _ = infer(jnp.asarray(patches[s : s + max_patches_per_call]))
            srs.append(np.asarray(sr_p))
            segs.append(np.asarray(seg_p))
        sr_pred = joint_patch(jnp.asarray(np.concatenate(srs)), img_ushape)
        seg_pred = joint_patch(jnp.asarray(np.concatenate(segs)), seg_ushape)
        save_img(output_dir, np.clip(np.asarray(sr_pred), 0, 1), [fname])
        seg_np = np.asarray(seg_pred)
        for idx in save_idx:
            save_mask(output_dir, (seg_np > thresholds[idx]).astype(np.float32), [fname], thresholds[idx])
        save_mask(output_dir, seg_np, [fname], -1)
        if (i + 1) % 10 == 0:
            log_fn(f"tti inference {(i+1)}/{len(dataset)}")


def save_iou_log(aiu_scores, thresholds, fnames, output_dir):
    """iou_log.csv (`inference.py:287-291`)."""
    import pandas as pd

    os.makedirs(output_dir, exist_ok=True)
    df = pd.DataFrame(aiu_scores, columns=[float(t) for t in thresholds], index=fnames)
    df.to_csv(os.path.join(output_dir, "iou_log.csv"))
