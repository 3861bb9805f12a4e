"""End-to-end benchmark: sparse-SLAM frames/s on one TPU chip.

Measures the reference's headline performance number (run_batrack.py:73-80:
end-to-end SLAM FPS) on a synthetic 480x640 RGB-D sequence with the full
MDTracker (random weights — identical compute to the pretrained ones) and
the production config (400 patches/frame, 288k-edge factor graph, 4x dual BA
per frame).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured FPS / 0.5 — the reference publishes no numbers
(BASELINE.md), so 0.5 FPS is our estimate of the reference pipeline on its
A40 (a CoTracker-class sliding-window transformer over 2400 tracks plus
dozens of small-kernel BA launches per frame); the ≥5x target of
BASELINE.json corresponds to vs_baseline ≥ 5.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ASSUMED_REFERENCE_FPS = 0.5


def main() -> int:
    import jax
    import jax.numpy as jnp

    from batrack_tpu.geometry import se3
    from batrack_tpu.slam import BATrack
    from batrack_tpu.tracker import MDTrackerAdapter
    from batrack_tpu.utils.config import Config

    HT, WD = 480, 640
    T = 30
    WARMUP_FRAMES = 16  # includes init (num_init=12) + first steady frames
    INTR = np.array([500.0, 500.0, WD / 2, HT / 2], np.float32)

    cfg = Config()
    cfg.slam.BUFFER_SIZE = 64  # enough for the benchmark sequence
    cfg.model.use_pallas_corr = True
    cfg.model.use_flash_attention = True
    cfg.model.compute_dtype = "bfloat16"

    # synthetic scene: plane at z=6, smooth trajectory
    ts = np.arange(T, dtype=np.float32)
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
        return ((6.0 - c2w[2]) / (dirc @ R.T)[..., 2]).astype(np.float32)

    depths = np.stack([plane_depth(p) for p in poses_gt])
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (T, HT, WD, 3)).astype(np.float32)

    slam = BATrack(cfg, HT, WD, seed=0)
    slam.tracker = MDTrackerAdapter(cfg.model)

    # drive; timing only the steady-state frames (compile excluded)
    for t in range(WARMUP_FRAMES):
        slam(t, images[t], depths[t], INTR)
    jax.block_until_ready(slam.state.poses)
    float(slam.state.poses[0, 0])  # force full pipeline flush

    t0 = time.time()
    for t in range(WARMUP_FRAMES, T):
        slam(t, images[t], depths[t], INTR)
    float(slam.state.poses[slam.n - 1, 0])  # flush async dispatch
    elapsed = time.time() - t0
    fps = (T - WARMUP_FRAMES) / elapsed

    print(json.dumps({
        "metric": "slam_fps_e2e",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / ASSUMED_REFERENCE_FPS, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
