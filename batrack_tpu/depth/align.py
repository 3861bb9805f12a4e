"""Stage-1 depth-prior alignment: relative disparity -> normalized metric depth.

Rebuild of main/mono_depth/get_mono_depth.py:21-150: per-frame median
scale/shift fitting of a relative-disparity model (DepthAnything-style .npy
files) against a metric model (UniDepth-style .npz {depth, intrinsics}),
sky-ratio handling, a global (scale, shift) picked at the median
scale*shift product, 98th-percentile normalization, and a shared pinhole K
derived from the median metric FOV.

The depth networks themselves are treated as external providers (SURVEY.md
§7.7): this module consumes their saved outputs. Everything here is numpy —
it is file-preprocessing, not a TPU hot path.
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence, Tuple

import numpy as np


def intrinsics_to_fov(K: np.ndarray, depth: np.ndarray) -> float:
    """Horizontal FOV in degrees (get_mono_depth.py:10-18)."""
    return float(np.rad2deg(2 * np.arctan(depth.shape[-1] / (2 * K[0, 0]))))


def fit_frame_scale_shift(
    mono_disp: np.ndarray, metric_depth: np.ndarray
) -> Tuple[float, float, float]:
    """Median-based scale/shift of mono disparity onto metric disparity.

    Returns (scale, shift, sky_ratio). Follows get_mono_depth.py:71-99,
    including the UniDepth near-field guard and the final (non-sky-masked)
    re-fit that overrides the sky branch in the reference.
    """
    gt_disp = 1.0 / (metric_depth + 1e-8)
    invalid = (metric_depth < 2.0) & (mono_disp < 0.02)
    gt_disp = gt_disp.copy()
    gt_disp[invalid] = 1e-2

    sky_ratio = float(np.mean(mono_disp < 0.01))

    # (the reference computes a sky-masked fit first but unconditionally
    # overwrites it with the unmasked fit at :95-99; reproduce that net
    # behaviour)
    gt_ms = gt_disp - np.median(gt_disp) + 1e-8
    da_ms = mono_disp - np.median(mono_disp) + 1e-8
    scale = float(np.median(gt_ms / da_ms))
    shift = float(np.median(gt_disp - scale * mono_disp))
    return scale, shift, sky_ratio


def resize_nearest(img: np.ndarray, shape_hw: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(
            img, (shape_hw[1], shape_hw[0]), interpolation=cv2.INTER_NEAREST_EXACT
        )
    except ImportError:
        ys = (np.arange(shape_hw[0]) * img.shape[0] / shape_hw[0]).astype(int)
        xs = (np.arange(shape_hw[1]) * img.shape[1] / shape_hw[1]).astype(int)
        return img[ys][:, xs]


def align_depth_sequence(
    mono_disps: Sequence[np.ndarray],
    metric_depths: Sequence[np.ndarray],
    metric_Ks: Sequence[np.ndarray],
    image_wh: Tuple[int, int],
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Align a whole sequence; returns (aligned depth maps, shared K).

    Mirrors get_mono_depth.py:47-140: per-frame fits, global pick at the
    median scale*shift product, percentile normalization, shared K from the
    median metric FOV.
    """
    scales, shifts, fovs, disps = [], [], [], []
    for disp, depth, K in zip(mono_disps, metric_depths, metric_Ks):
        fovs.append(intrinsics_to_fov(np.asarray(K), np.asarray(depth)))
        disp = resize_nearest(np.float32(disp), depth.shape[:2])
        disps.append(disp)
        s, t, _ = fit_frame_scale_shift(disp, np.asarray(depth))
        scales.append(s)
        shifts.append(t)

    W, H = image_wh
    ff = W / (2 * np.tan(np.radians(np.median(fovs) / 2.0)))
    K = np.eye(3)
    K[0, 0] = K[1, 1] = ff
    K[0, 2] = W / 2.0
    K[1, 2] = H / 2.0

    ss = np.asarray(scales) * np.asarray(shifts)
    med_idx = int(np.argmin(np.abs(ss - np.median(ss))))
    a_scale, a_shift = scales[med_idx], shifts[med_idx]
    norm = float(
        np.percentile(a_scale * np.asarray(disps) + a_shift, 98) / 2.0
    )

    out = []
    for disp in disps:
        depth = np.clip(1.0 / ((1.0 / norm) * (a_scale * disp + a_shift)), 1e-4, 1e4)
        depth[depth < 1e-2] = 0.0
        out.append(depth.astype(np.float32))
    return out, K


def align_depth_dirs(
    mono_depth_dir: str,
    metric_depth_dir: str,
    image_dir: str,
    save_depth_dir: str,
    save_K_dir: str,
) -> None:
    """File-level driver matching the reference CLI (get_mono_depth.py:21-150).

    mono_depth_dir: *.npy relative disparities; metric_depth_dir: *.npz with
    {depth, intrinsics}. Writes aligned *.npy depths + *_intrinsics.npy.
    """
    os.makedirs(save_depth_dir, exist_ok=True)
    os.makedirs(save_K_dir, exist_ok=True)

    mono_paths = sorted(glob.glob(os.path.join(mono_depth_dir, "*.npy")))
    metric_paths = sorted(glob.glob(os.path.join(metric_depth_dir, "*.npz")))
    images = sorted(
        glob.glob(os.path.join(image_dir, "*.jpg"))
        + glob.glob(os.path.join(image_dir, "*.png"))
    )
    import cv2

    img0 = cv2.imread(images[0])
    H, W = img0.shape[:2]

    mono = [np.load(p) for p in mono_paths]
    metric = [np.load(p) for p in metric_paths]
    depths = [m["depth"] for m in metric]
    Ks = [m["intrinsics"] for m in metric]

    aligned, K = align_depth_sequence(mono, depths, Ks, (W, H))
    for p_metric, depth in zip(metric_paths, aligned):
        base = os.path.basename(p_metric).replace(".npz", "")
        np.save(os.path.join(save_depth_dir, base + ".npy"), depth)
        np.save(os.path.join(save_K_dir, base + "_intrinsics.npy"), K)
