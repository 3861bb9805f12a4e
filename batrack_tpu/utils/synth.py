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
