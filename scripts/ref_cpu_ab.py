"""Software-efficiency bound: the reference SLAM loop vs ours on the SAME
CPU (VERDICT r3 #6).

The reference publishes no FPS and its A40 is unavailable here, but the
parity harness already runs the full reference BATRACK (torch CPU, real
ba.py/batrack.py) end-to-end. Timing both loops on identical hardware, same
scene, same config, same oracle tracker isolates the SLAM/BA machinery's
software efficiency — one measured anchor for BENCH notes in place of the
naked reference_fps_estimate guess. (It is NOT an A40-vs-TPU statement: the
tracker is oracle-stubbed on both sides and torch-CPU is not CUDA.)

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/ref_cpu_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    assert jax.default_backend() == "cpu", (
        "run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — this is a "
        "same-hardware software A/B, not a TPU benchmark"
    )
    import test_slam_ref_parity as T

    # the module-level fixture body (static plane scene)
    import numpy as np

    import jax.numpy as jnp
    from batrack_tpu.geometry import se3

    ts = np.arange(T.T_FRAMES, dtype=np.float32)
    xi = np.stack(
        [0.06 * ts, 0.03 * np.sin(ts * 0.3), 0.015 * ts,
         0.008 * np.sin(ts * 0.2), 0.012 * np.cos(ts * 0.25) - 0.012,
         0.0 * ts], -1)
    poses_gt = np.asarray(se3.exp(jnp.asarray(xi)), np.float32)
    fx, fy, cx, cy = T.INTR
    u, v = np.meshgrid(np.arange(T.WD), np.arange(T.HT))
    dirc = np.stack(
        [(u - cx) / fx, (v - cy) / fy, np.ones_like(u, np.float32)], -1)

    def plane_depth(p):
        c2w = np.asarray(se3.inv(jnp.asarray(p)))
        R = np.asarray(se3.matrix(jnp.asarray(c2w)))[:3, :3]
        return ((T.PLANE_Z - c2w[2]) / (dirc @ R.T)[..., 2]).astype(np.float32)

    depths = np.stack([plane_depth(p) for p in poses_gt])
    rng = np.random.default_rng(7)
    images = rng.uniform(
        0, 255, (T.T_FRAMES, T.HT, T.WD, 3)).astype(np.float32)
    scene = (poses_gt, depths, images)

    import tempfile

    # ours: first run compiles (excluded), second run is steady state
    t0 = time.perf_counter()
    T._run_ours(scene, {})
    ours_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    T._run_ours(scene, {})
    ours_warm = time.perf_counter() - t0

    # reference: torch has no compile phase; still time two passes
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        T._run_reference(scene, td, {})
        ref_cold = time.perf_counter() - t0
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        T._run_reference(scene, td, {})
        ref_warm = time.perf_counter() - t0

    frames = T.T_FRAMES
    print(json.dumps({
        "metric": "slam_loop_cpu_software_ab",
        "frames": frames,
        "config": f"M={T.M}, S_slam={T.S_SLAM}, {T.HT}x{T.WD}, ITER=2, "
                  "oracle tracker on both sides",
        "ours_warm_s": round(ours_warm, 2),
        "ours_fps": round(frames / ours_warm, 2),
        "ours_cold_s": round(ours_cold, 2),
        "reference_warm_s": round(ref_warm, 2),
        "reference_fps": round(frames / ref_warm, 2),
        "reference_cold_s": round(ref_cold, 2),
        "speedup_ours_vs_reference": round(ref_warm / ours_warm, 2),
        "notes": "identical CPU, identical scene/config/oracle; isolates "
                 "the SLAM/BA machinery (XLA-compiled static-shape loop vs "
                 "the reference's eager torch small-kernel loop). Not an "
                 "A40 measurement.",
    }))


if __name__ == "__main__":
    main()
