"""Multi-device scaling benchmark: SLAM FPS at 1/2/4/8 devices.

Drives the REAL BATrack loop (oracle tracker, synthetic plane scene) with
the backend patch-sharded over an N-device mesh (parallel/sharded_slot_ba)
and prints one JSON line:

  {"metric": "slam_scaling", "fps": {"1": .., "2": .., ...},
   "efficiency": {...}, "backend": ..., "notes": ...}

efficiency[n] = fps[n] / (n * fps[1]).

On this environment's single tunneled TPU chip the mesh is the virtual
8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8 is
set automatically when only one real device exists), so the numbers
validate the sharded dataflow and measure collective overhead, NOT real
ICI scaling — run on a real pod slice for that. BASELINE.json's north
star (>=80% efficiency at N>=2 hosts) is judged on real hardware.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _ensure_devices():
    """If fewer than 8 devices are visible, restart on a virtual 8-device CPU.

    The device probe runs in a subprocess with a timeout: initializing a
    tunneled TPU backend can HANG (not error) when the tunnel is down, and
    once `import jax` has initialized a backend in this process it cannot be
    switched.
    """
    import subprocess

    n = 0
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
            capture_output=True, timeout=90, text=True,
        )
        if r.returncode == 0 and r.stdout.strip():
            n = int(r.stdout.strip().splitlines()[-1])
    except Exception:
        n = 0
    if n >= 8:
        return
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    os.execv(sys.executable, [sys.executable] + sys.argv + ["--respawned"])


def main() -> int:
    if "--respawned" not in sys.argv:
        _ensure_devices()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from batrack_tpu.geometry import se3
    from batrack_tpu.parallel import get_mesh
    from batrack_tpu.slam import BATrack, OracleTracker
    from batrack_tpu.utils.config import Config

    # production-shaped backend at reduced spatial size (the tracker is the
    # oracle: this benchmark isolates the sharded BA/backend scaling)
    HT, WD = 120, 160
    T, WARM = 40, 16
    INTR = np.array([125.0, 125.0, WD / 2, HT / 2], np.float32)

    cfg = Config()
    s = cfg.slam
    s.BUFFER_SIZE = 64
    s.PATCHES_PER_FRAME = 400
    s.PATCH_GEN = "grid_grad_20"
    s.BA_EP = 0.4  # damping scaled to the reduced focal length

    ts = np.arange(T, dtype=np.float32)
    xi = np.stack(
        [0.05 * ts, 0.02 * np.sin(ts * 0.3), 0.01 * ts,
         0.004 * np.sin(ts * 0.2), 0.006 * np.cos(ts * 0.25) - 0.006, 0 * ts],
        -1,
    )
    poses_gt = np.asarray(se3.exp(jnp.asarray(xi)), np.float32)
    u, v = np.meshgrid(np.arange(WD), np.arange(HT))
    dirc = np.stack(
        [(u - INTR[2]) / INTR[0], (v - INTR[3]) / INTR[1],
         np.ones_like(u, np.float32)], -1,
    )
    depths = []
    for p in poses_gt:
        c2w = np.asarray(se3.inv(jnp.asarray(p)))
        R = np.asarray(se3.matrix(jnp.asarray(c2w)))[:3, :3]
        depths.append(((6.0 - c2w[2]) / (dirc @ R.T)[..., 2]).astype(np.float32))
    depths = np.stack(depths)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, (T, HT, WD, 3)).astype(np.float32)

    def run(n_dev):
        mesh = get_mesh(n_dev, ("patch",)) if n_dev > 1 else None
        slam = BATrack(cfg, HT, WD, seed=0, mesh=mesh)
        slam.tracker = OracleTracker(poses_gt, INTR, slam.dims)
        for t in range(WARM):
            slam(t, images[t], depths[t], INTR)
        float(slam.state.poses[0, 0])
        t0 = time.time()
        for t in range(WARM, T):
            slam(t, images[t], depths[t], INTR)
        float(slam.state.poses[slam.n - 1, 0])
        return (T - WARM) / (time.time() - t0)

    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    fps = {str(n): round(run(n), 3) for n in counts}
    eff = {
        str(n): round(fps[str(n)] / (n * fps["1"]), 3) for n in counts if n > 1
    }
    print(json.dumps({
        "metric": "slam_scaling",
        "fps": fps,
        "efficiency": eff,
        "backend": jax.default_backend(),
        "n_devices_visible": len(jax.devices()),
        "notes": "oracle tracker; patch-sharded slot BA backend. On the "
                 "virtual CPU mesh this validates the sharded dataflow and "
                 "collective overhead, not real ICI scaling.",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
