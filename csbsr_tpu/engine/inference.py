"""Test-time inference harness.

Rebuild of `/root/reference/model/engine/inference.py` (inference_for_ss):
patched LR -> jitted model -> patch reassembly -> PSNR/SSIM/kernel-PSNR,
99-threshold binarisation -> IoU per threshold (AIU), optional HD/MSD via
the host surface-distance metric, mask/image/kernel dumps, iou_log.csv.

TPU-first: the patch axis is the batch axis (sharded over the mesh); the
99-threshold IoU is one broadcasted op on device; the 99-threshold HD/MSD
bank is one jitted device program (metrics/device_surface.py) with the
host scipy/C++ implementation kept as a parity oracle
(--surface_distance_host).
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


def _prefetched(dataset, depth: int = 2):
    """Yield dataset.get(i) for i in range(len(dataset)), loading `depth`
    items ahead on one background thread so host decode/patching overlaps
    the device's async dispatch (the serving-side analog of the train
    loader's prefetch; closes the per-image host stall between calls)."""
    from concurrent.futures import ThreadPoolExecutor

    n = len(dataset)
    with ThreadPoolExecutor(max_workers=1) as pool:
        futs = [pool.submit(dataset.get, i) for i in range(min(depth, n))]
        for i in range(n):
            item = futs.pop(0).result()
            nxt = i + depth
            if nxt < n:
                futs.append(pool.submit(dataset.get, nxt))
            yield item


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


def calibrate_int8(model, variables, sample_patches):
    """Enable the int8 serving path and calibrate static activation scales.

    One bf16 pass over a representative patch batch with
    ``mutable=["quant"]`` records per-conv activation abs-maxima
    (csbsr_tpu/ops/quant.py); returning them inside `variables` switches the
    quantized blocks to static scales. Accuracy is checkpoint-dependent —
    validate with tools/int8_accuracy.py before production use.
    """
    import csbsr_tpu.models.blocks as blocks_mod

    blocks_mod.INT8_SERVE = True
    _, quant = jax.jit(
        lambda v, p: model.apply(
            v, p, None, False, train=False, clip_sr=True, mutable=["quant"]
        )
    )(variables, jnp.asarray(sample_patches))
    return dict(variables, quant=quant["quant"])


def inference_for_ss(
    cfg,
    model,
    variables,
    dataset,
    *,
    output_dir: str,
    test_aiu: bool = True,
    test_surface_distance: bool = False,
    surface_distance_device: bool = True,
    test_classification_metrics: bool = False,
    save_images: bool = False,
    wandb_flag: bool = False,
    wandb_project: str = "CSBSR_test",
    log_fn=print,
) -> Dict[str, float]:
    """Evaluate over a CrackDataSetTest-style dataset. Returns summary dict.

    Observability mirrors the reference harness (`inference.py:148-207`):
    per-image metric rows and run means go to OUTPUT_DIR/metrics.jsonl (and
    wandb when enabled); metric-vs-threshold curves are saved as pngs and
    streamed to wandb like plot_metrics_th.
    """
    from ..utils.logging import MetricsLogger

    mlog = MetricsLogger(output_dir, wandb_flag=wandb_flag, project=wandb_project,
                         config=dict(cfg))
    if mlog.wandb_run is not None:
        # wandb.watch(model) analog at eval time (reference inference.py:72)
        mlog.log_histograms(variables.get("params", variables), step=0)
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

    for i, item in enumerate(_prefetched(dataset)):
        patches, sr_target, seg_target, kernels, fname, img_ushape, seg_ushape = item
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
            if surface_distance_device:
                # whole 99-threshold bank scored on device in one jitted call
                # (metrics/device_surface.py); the host path below is the
                # scipy parity oracle. Zero-pad to 64-px size buckets so a
                # variable-size test set compiles the EDT program once per
                # bucket, not once per distinct image shape (padding is
                # exact: zero contour area, no new borders; only the
                # empty-mask outlier needs the original size, passed as
                # max_len)
                from ..metrics.device_surface import distance_metrics_banked

                ph, pw = (-(-seg_pred.shape[1] // 64)) * 64, (-(-seg_pred.shape[2] // 64)) * 64
                pad = [(0, 0), (0, ph - seg_pred.shape[1]), (0, pw - seg_pred.shape[2])]
                hd, msd = distance_metrics_banked(
                    jnp.pad(seg_pred[:, :, :, 0], pad),
                    jnp.pad(seg_t[:, :, :, 0] > 0.5, pad),
                    th_dev,
                    max_len=jnp.float32(max(seg_pred.shape[1], seg_pred.shape[2])),
                )
                hd_rows.append(np.asarray(hd)[0])
                msd_rows.append(np.asarray(msd)[0])
            else:
                seg_bi = np.asarray(seg_pred[:, :, :, 0])[:, None] > thresholds[:, None, None]
                seg_bi = np.moveaxis(seg_bi, 0, 1) if seg_bi.shape[0] != 1 else seg_bi
                gt_bi = np.asarray(seg_t[:, :, :, 0])[:, None] > 0.5
                hd, msd = calc_distance_metrics(seg_bi, gt_bi)
                hd_rows.append(hd[0])
                msd_rows.append(msd[0])

        # per-image row (reference wandb_log, inference.py:148-160)
        row = {
            "PSNR_score": psnr_scores[-1],
            "SSIM_score": ssim_scores[-1],
            "PSNR(Kernel)_score": kpsnr_scores[-1],
            "AIU_scores": float(np.mean(aiu_rows[-1])),
        }
        if hd_rows:
            row["HD95_scores"] = float(np.mean(hd_rows[-1]))
            row["MSD_scores"] = float(np.mean(msd_rows[-1]))
        mlog.log(row, step=i)

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
    # run means (+medians for the robust distances, inference.py:179-193)
    final = {f"{k}_mean": v for k, v in summary.items()}
    if hd_rows:
        final["HD95_score_median"] = float(np.median(ahd))
        final["MSD_score_median"] = float(np.median(amsd))
    mlog.log(final, step=len(dataset))
    # metric-vs-threshold artifacts (plot_metrics_th, inference.py:275-285)
    if test_aiu:
        plot_metrics_th(aiu, thresholds, "IoU", output_dir, wandb_run=mlog.wandb_run)
    if hd_rows:
        for med in (False, True):
            plot_metrics_th(ahd, thresholds, "HD95", output_dir, med=med,
                            wandb_run=mlog.wandb_run)
            plot_metrics_th(amsd, thresholds, "MSD", output_dir, med=med,
                            wandb_run=mlog.wandb_run)
    save_iou_log(aiu, thresholds, fnames, output_dir)
    mlog.close()
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

    for i, item in enumerate(_prefetched(dataset)):
        patches, fname, img_ushape, seg_ushape = item
        srs, segs, k2ds = [], [], []
        for s in range(0, patches.shape[0], max_patches_per_call):
            sr_p, seg_p, k2d = infer(jnp.asarray(patches[s : s + max_patches_per_call]))
            # chunks STAY on device: the old host-f32 copy per chunk +
            # host concat + device re-upload + host-f32 final copy moved
            # ~26 MB/image through the tunnel where ~5.6 MB suffices
            # (PERF.md round 5 - transfer, not compute, dominates the
            # full-image serving path)
            srs.append(sr_p)
            segs.append(seg_p)
            k2ds.append(k2d)
        sr_pred = joint_patch(jnp.concatenate(srs), img_ushape)
        seg_pred = joint_patch(jnp.concatenate(segs), seg_ushape)
        # SR crosses as uint8 - bit-identical to the PNG save_img writes
        # (same clip*255+round); seg crosses f32 ONCE because the
        # thresholded masks compare in float exactly like the reference
        sr_u8 = np.asarray(
            jnp.round(jnp.clip(sr_pred.astype(jnp.float32), 0, 1) * 255.0)
            .astype(jnp.uint8))
        save_img(output_dir, sr_u8.astype(np.float32) / 255.0, [fname])
        if cfg.MODEL.SR == "KBPN":
            # predicted-kernel dump (`inference.py:259-260`)
            save_kernel(output_dir, np.asarray(k2ds[0][:1]), [fname])
        seg_np = np.asarray(seg_pred)
        for idx in save_idx:
            save_mask(output_dir, (seg_np > thresholds[idx]).astype(np.float32), [fname], thresholds[idx])
        save_mask(output_dir, seg_np, [fname], -1)
        if (i + 1) % 10 == 0:
            log_fn(f"tti inference {(i+1)}/{len(dataset)}")


def plot_metrics_th(scores, thresholds, name, output_dir, med=False, wandb_run=None):
    """Metric-vs-threshold curve artifact (`inference.py:275-285`).

    The reference streams the curve point-by-point to wandb; here it is also
    rendered to <output_dir>/<name>[_median]_vs_threshold.png so the artifact
    exists without a network.
    scores: (N_images, T); thresholds: (T,).
    """
    curve = np.median(scores, axis=0) if med else np.mean(scores, axis=0)
    label = name + ("_median" if med else "")
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.0, 3.5))
    ax.plot(np.asarray(thresholds), curve, color="#4269d0", linewidth=1.5)
    ax.set_xlabel("threshold")
    ax.set_ylabel(label)
    ax.set_title(f"{label} vs threshold")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    os.makedirs(output_dir, exist_ok=True)
    fig.savefig(os.path.join(output_dir, f"{label}_vs_threshold.png"), dpi=120)
    plt.close(fig)
    if wandb_run is not None:
        # reference inference.py:275-285 appends "_median" to the metric
        # name BEFORE logging, so mean and median land in separate series
        for v, th in zip(curve, np.asarray(thresholds)):
            wandb_run.log({f"{label}(thresholds)": float(v), "thresholds": float(th)})


def save_iou_log(aiu_scores, thresholds, fnames, output_dir):
    """iou_log.csv (`inference.py:287-291`)."""
    import pandas as pd

    os.makedirs(output_dir, exist_ok=True)
    df = pd.DataFrame(aiu_scores, columns=[float(t) for t in thresholds], index=fnames)
    df.to_csv(os.path.join(output_dir, "iou_log.csv"))
