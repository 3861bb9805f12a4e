"""Synthetic scene shared by benchmarks, validation and smoke tests.

Two public scene builders over ONE implementation (`_plane_scene`) —
drift between the benchmarks' synthetic worlds is a bug:

  * `make_scene` — the bench/validation world (bench.py, bench_scaling.py,
    scripts/validate_checkpoint.py). Returns (images, depths, poses_gt).
  * `parity_scene` — the reference-parity world
    (tests/test_slam_ref_parity.py, scripts/ref_cpu_ab.py). Returns
    (poses_gt, depths, images).

The return orders differ for historical reasons; both tuples are typed
ndarrays of different shapes, so a mixed-up unpacking fails fast on shape
checks downstream — but prefer keeping call sites on their own builder.
"""

from __future__ import annotations

import numpy as np

# (coefficient rows of the se3 tangent, image-noise seed) per world
_BENCH_COEFFS = (0.05, 0.02, 0.01, 0.004, 0.006, 0.0)
_PARITY_COEFFS = (0.06, 0.03, 0.015, 0.008, 0.012, 0.0)


def _plane_scene(ts, HT, WD, INTR, se3, jnp, plane_z, coeffs, img_seed):
    """Textured plane at z=plane_z under a smooth trajectory driven by the
    per-frame timestamps ts. Returns (poses_gt(w2c (T,7)), depths, images).
    se3/jnp are passed in so callers control the backend (CPU vs TPU)
    without this module importing jax at module scope."""
    ts = np.asarray(ts, np.float32)
    c = coeffs
    xi = np.stack(
        [c[0] * ts, c[1] * np.sin(ts * 0.3), c[2] * ts,
         c[3] * np.sin(ts * 0.2), c[4] * np.cos(ts * 0.25) - c[4],
         c[5] * ts], -1)
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


def make_scene(T, HT, WD, INTR, se3, jnp, plane_z=6.0, xi_scale=1.0):
    """Bench/validation scene. Returns (images, depths, poses_gt)."""
    ts = np.arange(T, dtype=np.float32) * xi_scale
    poses_gt, depths, images = _plane_scene(
        ts, HT, WD, INTR, se3, jnp, plane_z, _BENCH_COEFFS, img_seed=0)
    return images, depths, poses_gt


def parity_scene(ts, HT, WD, INTR, se3, jnp, plane_z=6.0, img_seed=7):
    """The reference-parity suite's plane scene (tests/test_slam_ref_parity
    and scripts/ref_cpu_ab.py share it — the CPU software A/B's 'identical
    scene' claim depends on this being the single definition).

    ts: per-frame timestamps — np.arange(T) for the smooth trajectory, or a
    cumulative velocity profile with pauses for the stop-and-go
    keyframe-removal scene. Returns (poses_gt(w2c (T,7)), depths, images).
    """
    return _plane_scene(
        ts, HT, WD, INTR, se3, jnp, plane_z, _PARITY_COEFFS, img_seed)
