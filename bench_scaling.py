"""Multi-device scaling benchmark: sharded SLAM + tracker at 1/2/4/8 devices.

Two sections, one JSON line each:

  {"metric": "slam_scaling", "fps": {...}, "overhead": {...}, ...}
     — the REAL BATrack loop (oracle tracker, synthetic plane scene) with
       the backend patch-sharded over an N-device mesh
       (parallel/sharded_slot_ba). Validates the production sharded
       dataflow end-to-end.
  {"metric": "tracker_scaling", "sec_per_forward": {...}, "overhead": {...}}
     — the MDTracker forward (the >80%-of-device-time component,
       ROOFLINE.md) with the query axis sharded over the mesh; space
       attention all-gathers across it, everything else is per-track.

Measurement semantics on THIS environment: only one real TPU chip exists
(behind the axon tunnel), so the mesh is the virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, set automatically).
All virtual devices share the same host cores — total compute capacity is
constant in n — so the honest figure is NOT fps[n]/(n*fps[1]) but

  overhead[n] = time_sharded[n] / time_unsharded - 1

i.e. the extra cost GSPMD partitioning + collectives add to a fixed-size
problem. On real chips, where each shard has its own compute,
strong-scaling efficiency is approximately 1 / (1 + overhead) for the
compute-bound tracker section; BASELINE.json's north star (>=80%
efficiency at N>=2 hosts) is judged on real hardware.
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
    if n >= 2:
        # 2+ real devices: measure REAL multi-chip scaling (counts are
        # filtered to the visible device count); only a single-device or
        # unreachable backend falls back to the virtual CPU mesh
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

    from bench import make_scene  # single scene definition for all benches

    images, depths, poses_gt = make_scene(T, HT, WD, INTR, se3, jnp)

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
    overhead = {
        str(n): round(fps["1"] / fps[str(n)] - 1.0, 3)
        for n in counts if n > 1
    }
    shared_compute = jax.default_backend() == "cpu"
    print(json.dumps({
        "metric": "slam_scaling",
        "fps": fps,
        "overhead": overhead,
        "backend": jax.default_backend(),
        "n_devices_visible": len(jax.devices()),
        "shared_compute_mesh": shared_compute,
        "notes": "oracle tracker; patch-sharded slot BA backend; "
                 "overhead[n] = time_sharded[n]/time_unsharded - 1 on a "
                 "fixed-size problem. On the virtual CPU mesh all devices "
                 "share the host cores, so this validates the sharded "
                 "dataflow and prices the collectives, not real ICI "
                 "scaling. The BA step is latency-bound at this size; the "
                 "compute-bound component's scaling is the tracker_scaling "
                 "section.",
    }), flush=True)

    # ---- tracker forward scaling (the dominant compute, track-sharded) ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    from batrack_tpu.parallel import get_mesh as _get_mesh
    from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

    tp = TrackerParams(S=8, iters=2, static_iters=1, interp_shape=(96, 128))
    model = MDTracker(tp)
    trng = np.random.default_rng(1)
    S, H, W, N = 8, 96, 128, 1024
    window = jnp.asarray(trng.uniform(0, 255, (S, 4, H, W)), jnp.float32)
    window = window.at[:, 3].set(
        jnp.asarray(trng.uniform(2, 6, (S, H, W)), jnp.float32))
    queries = jnp.asarray(np.stack(
        [np.zeros(N), trng.uniform(5, W - 5, N), trng.uniform(5, H - 5, N),
         trng.uniform(2, 6, N)], -1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), window, queries)

    def timed_forward(n_dev):
        if n_dev == 1:
            fn = jax.jit(lambda p, w, q: model.apply(p, w, q)[0])
        else:
            mesh = _get_mesh(n_dev, ("track",))

            def fwd(p, w, q):
                q = jax.lax.with_sharding_constraint(
                    q, NamedSharding(mesh, P("track", None)))
                out = model.apply(p, w, q)[0]
                return jax.lax.with_sharding_constraint(
                    out, NamedSharding(mesh, P(None, "track", None)))

            fn = jax.jit(fwd)
        out = fn(params, window, queries)
        float(out[0, 0, 0])  # compile + warm; a scalar fetch actually
        # flushes execution (block_until_ready returns early on the
        # tunneled TPU backend)
        reps, t0 = 2, time.time()
        for _ in range(reps):
            out = fn(params, window, queries)
        float(out[0, 0, 0])
        return (time.time() - t0) / reps

    sec_raw = {n: timed_forward(n) for n in counts}
    sec = {str(n): round(v, 3) for n, v in sec_raw.items()}
    # overhead from UNROUNDED times (a sub-ms baseline rounded to 3 decimals
    # would divide by zero)
    t_overhead = {
        str(n): round(sec_raw[n] / sec_raw[1] - 1.0, 3)
        for n in counts if n > 1
    }
    result = {
        "metric": "tracker_scaling",
        "sec_per_forward": sec,
        "overhead": t_overhead,
        "backend": jax.default_backend(),
        "shared_compute_mesh": shared_compute,
        "shapes": {"S": S, "H": H, "W": W, "N": N,
                   "iters": tp.iters, "static_iters": tp.static_iters},
        "notes": "full MDTracker forward, query axis sharded over the mesh "
                 "(space attention all-gathers; corr/flow/time-attention "
                 "stay shard-local). overhead[n] as above; on real chips "
                 "strong-scaling efficiency ~= 1/(1+overhead) since the "
                 "forward is compute-bound.",
    }
    if shared_compute:
        # negative overhead happens on the shared-compute mesh (multi-device
        # async dispatch uses the host cores better than one device); cap the
        # projection at 1.0 — it is a bound, not a promise
        result["projected_real_chip_efficiency"] = {
            n: round(min(1.0, 1.0 / (1.0 + v)), 3)
            for n, v in t_overhead.items()
        }
    print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
