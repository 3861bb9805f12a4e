"""Synthetic scene shared by benchmarks, validation and smoke tests.

One scene definition for bench.py, bench_scaling.py, __graft_entry__.py and
scripts/validate_checkpoint.py — drift between the benchmarks' synthetic
worlds is a bug.
"""

from __future__ import annotations

import numpy as np


def make_scene(T, HT, WD, INTR, se3, jnp, plane_z=6.0, xi_scale=1.0):
    """Textured plane at z=plane_z under a smooth trajectory.

    Returns (images, depths, poses_gt(w2c (T, 7))). se3/jnp are passed in so
    callers control the backend (CPU vs TPU) without this module importing
    jax at module scope.
    """
    ts = np.arange(T, dtype=np.float32) * xi_scale
    xi = np.stack(
        [0.05 * ts, 0.02 * np.sin(ts * 0.3), 0.01 * ts,
         0.004 * np.sin(ts * 0.2), 0.006 * np.cos(ts * 0.25) - 0.006, 0 * ts], -1)
    poses_gt = np.asarray(se3.exp(jnp.asarray(xi)), np.float32)
    fx, fy, cx, cy = INTR
    u, v = np.meshgrid(np.arange(WD), np.arange(HT))
    dirc = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float32)], -1)

    def plane_depth(p):
        c2w = np.asarray(se3.inv(jnp.asarray(p)))
        R = np.asarray(se3.matrix(jnp.asarray(c2w)))[:3, :3]
        return ((plane_z - c2w[2]) / (dirc @ R.T)[..., 2]).astype(np.float32)

    depths = np.stack([plane_depth(p) for p in poses_gt])
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (T, HT, WD, 3)).astype(np.float32)
    return images, depths, poses_gt


def parity_scene(ts, HT, WD, INTR, se3, jnp, plane_z=6.0, img_seed=7):
    """The reference-parity suite's plane scene (tests/test_slam_ref_parity
    and scripts/ref_cpu_ab.py share it — the CPU software A/B's 'identical
    scene' claim depends on this being the single definition).

    ts: per-frame timestamps — np.arange(T) for the smooth trajectory, or a
    cumulative velocity profile with pauses for the stop-and-go
    keyframe-removal scene. Returns (poses_gt(w2c (T,7)), depths, images).
    """
    ts = np.asarray(ts, np.float32)
    xi = np.stack(
        [0.06 * ts, 0.03 * np.sin(ts * 0.3), 0.015 * ts,
         0.008 * np.sin(ts * 0.2), 0.012 * np.cos(ts * 0.25) - 0.012,
         0 * ts], -1)
    poses_gt = np.asarray(se3.exp(jnp.asarray(xi)), np.float32)
    fx, fy, cx, cy = INTR
    u, v = np.meshgrid(np.arange(WD), np.arange(HT))
    dirc = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float32)], -1)

    def plane_depth(p):
        c2w = np.asarray(se3.inv(jnp.asarray(p)))
        R = np.asarray(se3.matrix(jnp.asarray(c2w)))[:3, :3]
        return ((plane_z - c2w[2]) / (dirc @ R.T)[..., 2]).astype(np.float32)

    depths = np.stack([plane_depth(p) for p in poses_gt])
    rng = np.random.default_rng(img_seed)
    images = rng.uniform(0, 255, (len(ts), HT, WD, 3)).astype(np.float32)
    return poses_gt, depths, images
