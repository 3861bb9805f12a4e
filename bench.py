"""End-to-end benchmark: sparse-SLAM frames/s on one TPU chip.

Measures the reference's headline performance number (run_batrack.py:73-80:
end-to-end SLAM FPS) at the production davis_demo configuration: 480x640
RGB-D frames, BUFFER_SIZE=1024, 400 patches/frame, S_slam=12 sliding window,
full MDTracker (random weights - identical compute to the pretrained ones)
with backward tracking, 4x dual BA per frame, 64-frame sequence.

Prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline", "stage_ms", "tracker_gflops",
   "mfu", "notes"}

vs_baseline is null: the reference publishes no numbers (BASELINE.md), so
there is no measured denominator. "reference_fps_estimate" records our
order-of-magnitude guess for the reference pipeline on its A40 (a
CoTracker-class sliding-window transformer over 2400 tracks plus dozens of
small-kernel BA launches per frame) - an estimate, not a measurement.

stage_ms comes from a separate amortised pass: each jitted stage is run
reps times back-to-back on a steady-state snapshot with ONE scalar-fetch
flush at the end (the tunneled backend's block_until_ready returns early,
and syncing every dispatch measures tunnel round-trips, not device time —
the r2 table's 263 ms "ingest" was exactly that artifact). The table is
cross-checked against the async FPS: predicted ms per kf_stride frames =
ingest_update + ingest + append + ba_update.

MFU uses the ANALYTIC per-forward FLOP count (utils/flops.py): XLA
cost_analysis cannot see inside Pallas kernels, so its number silently
drops when ops move into kernels (r2 reported 5.7 TFLOP for a 9.5 TFLOP
forward). The XLA metering is still emitted for reference.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# our estimate of the reference on its A40 - NOT a measurement (BASELINE.md)
REFERENCE_FPS_ESTIMATE = 0.5

# bf16 peak of the benched chip (TPU v5e); the tracker runs bf16, BA f32
PEAK_FLOPS = {"tpu": 197e12, "cpu": 1e12, "gpu": 1e12}


from batrack_tpu.utils.synth import make_scene  # noqa: E402 (shared scene)


def tracker_flops(slam):
    """Per-call device FLOPs of the jitted tracker forward (XLA estimate)."""
    try:
        ad = slam.tracker
        tin = slam._build_input(slam.state, np.int32(slam.n))
        lowered = ad._apply.lower(ad.params, tin.window_rgbd, tin.queries,
                                  None, reuse=0)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def probe_backend(attempts: int = 5, timeout_s: int = 120) -> bool:
    """True if a JAX backend initializes in a subprocess within timeout.

    Initializing the tunneled TPU backend HANGS (not errors) when the tunnel
    is down, and a wedged probe can block this process forever before a
    single measurement runs — so probe out-of-process, retrying a few times
    (the tunnel recovers on the order of minutes when it flaps)."""
    import subprocess

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=timeout_s,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"bench: backend probe {i + 1}/{attempts} failed",
              file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(30)
    return False


def main() -> int:
    if not probe_backend():
        print(json.dumps({
            "metric": "slam_fps_e2e", "value": None, "unit": "frames/s",
            "vs_baseline": None,
            "notes": "JAX backend initialization hung: the tunneled TPU is "
                     "unreachable (probed 5x out-of-process). Re-run when "
                     "the tunnel is healthy; last recorded healthy-chip "
                     "result is in ROOFLINE.md (7.97 FPS, 2026-08-17).",
        }))
        return 2

    import jax
    import jax.numpy as jnp

    from batrack_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from batrack_tpu.geometry import se3
    from batrack_tpu.slam import BATrack
    from batrack_tpu.tracker import MDTrackerAdapter
    from batrack_tpu.utils.config import Config

    HT, WD = 480, 640
    T = 64
    WARMUP_FRAMES = 16  # includes init (num_init=12) + first steady frames
    PROFILE_FRAMES = 8  # separate synced pass for the stage table
    INTR = np.array([500.0, 500.0, WD / 2, HT / 2], np.float32)

    cfg = Config()  # davis_demo defaults: BUFFER_SIZE=1024, M=400, ITER=4
    backend = jax.default_backend()

    # --mesh N: run the PRODUCTION MULTI-CHIP CODE PATH (shard_map kernels,
    # sharded slot BA, mesh tracker adapter) over N devices. N=1 on the real
    # chip measures the per-chip overhead of the mesh machinery vs mesh=None
    # (VERDICT r3 #1) — the only part of the scaling story measurable on a
    # single-chip tunnel.
    mesh_n = 0
    if "--mesh" in sys.argv:
        idx = sys.argv.index("--mesh")
        try:
            mesh_n = int(sys.argv[idx + 1])
        except (IndexError, ValueError):
            print("usage: bench.py [--mesh N]  (N = mesh device count)",
                  file=sys.stderr)
            return 2
    mesh = None
    if mesh_n:
        from batrack_tpu.parallel import get_mesh

        mesh = get_mesh(mesh_n, ("track",))

    images, depths, _ = make_scene(T, HT, WD, INTR, se3, jnp)

    slam = BATrack(cfg, HT, WD, seed=0, mesh=mesh)
    # backward tracking only when the SLAM window exceeds the tracker window
    # (batrack.py:570; 12 == 12 in davis_demo, so it is OFF in production)
    slam.tracker = MDTrackerAdapter(
        cfg.model,
        backward_tracking=cfg.slam.backward_tracking
        and cfg.slam.S_slam > cfg.model.S,
        mesh=mesh,
    )

    # ---- phase 1: e2e FPS, fully async (compile + init excluded) ----------
    # uploads are double-buffered: frame t+1 transfers while t computes
    nxt = slam.upload_frame(images[0], depths[0])
    for t in range(WARMUP_FRAMES):
        cur = nxt
        nxt = slam.upload_frame(images[t + 1], depths[t + 1])
        slam(t, cur[0], cur[1], INTR)
    jax.block_until_ready(slam.state.poses)
    float(slam.state.poses[0, 0])  # force full pipeline flush

    t0 = time.time()
    for t in range(WARMUP_FRAMES, T):
        cur = nxt
        if t + 1 < T:
            nxt = slam.upload_frame(images[t + 1], depths[t + 1])
        slam(t, cur[0], cur[1], INTR)
    float(slam.state.poses[slam.n - 1, 0])  # flush async dispatch
    elapsed = time.time() - t0
    fps = (T - WARMUP_FRAMES) / elapsed

    # ---- phase 2: per-stage device times (amortised, flushed once) --------
    # each stage runs REPS times back-to-back on the steady-state snapshot
    # with a single scalar-fetch flush — device time, not tunnel round-trips
    REPS = PROFILE_FRAMES
    img, dep = slam.upload_frame(images[0], depths[0])
    float(img[0, 0, 0]), float(dep[0, 0])  # land the transfers first

    def flush():
        return float(slam.state.tstamps[0])

    def timed(fn, warmup=2, reps=REPS):
        for _ in range(warmup):
            fn()
        flush()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        flush()
        return (time.perf_counter() - t0) / reps * 1000.0

    import jax.numpy as _jnp

    n_fixed = _jnp.asarray(slam.n - 2, _jnp.int32)  # stay inside the buffer
    key = jax.random.PRNGKey(0)

    def run_fused_iu():
        slam.state = slam._fused_ingest_update(
            slam.state, _jnp.asarray(img), _jnp.asarray(dep),
            _jnp.asarray(INTR, _jnp.float32), n_fixed,
            _jnp.asarray(slam.counter, _jnp.int32), key,
            mark_valid=_jnp.asarray(False), coords_override=None,
        )

    def run_ingest():
        slam.state, _ = slam._ingest(
            slam.state, _jnp.asarray(img), _jnp.asarray(dep),
            _jnp.asarray(INTR, _jnp.float32), n_fixed,
            _jnp.asarray(slam.counter, _jnp.int32), key,
            mark_valid=_jnp.asarray(False), coords_override=None,
        )

    ad = slam.tracker
    slam._ensure_fused_append()

    def run_append():
        slam.state, ad._fmap_cache = slam._fused_append(
            slam.state, ad.params, n_fixed, _jnp.asarray(0, _jnp.int32),
            ad._fmap_cache, reuse=cfg.slam.kf_stride,
        )

    def run_update():
        slam.state = slam._update(
            slam.state, n_fixed, _jnp.asarray(True)
        )

    stage_ms = {
        "ingest_update_fused": round(timed(run_fused_iu), 1),
        "ingest": round(timed(run_ingest), 1),
        "tracker_append": round(timed(run_append), 1),
        "ba_update": round(timed(run_update), 1),
    }
    # consistency: one kf_stride period = fused frame + (ingest+append+update)
    stage_ms["predicted_ms_per_2frames"] = round(
        stage_ms["ingest_update_fused"] + stage_ms["ingest"]
        + stage_ms["tracker_append"] + stage_ms["ba_update"], 1
    )
    stage_ms["measured_ms_per_2frames"] = round(2000.0 / fps, 1)

    # ---- FLOPs + MFU ------------------------------------------------------
    from batrack_tpu.utils.flops import tracker_forward_flops_from_params

    # the static-branch refinement output is consumed only under
    # use_static_mask/use_static (batrack.py:556-566; both off in
    # davis_demo) — the adapter's jit discards it and XLA DCEs the whole
    # dyn-branch transformer (verified: cost_analysis of the discarded
    # graph == static_iters=0). The reference executes it eagerly in torch;
    # we count only the FLOPs the device actually runs.
    eff_p = ad.p
    if not (ad.use_static_mask or ad.use_static):
        eff_p = eff_p._replace(static_iters=0)
    tr_flops_analytic = tracker_forward_flops_from_params(
        eff_p, N=slam.dims.n_src * slam.dims.M,
        H=ad.p.interp_shape[0], W=ad.p.interp_shape[1],
        new_frames=cfg.slam.kf_stride,
    )["total"]
    tr_flops_xla = tracker_flops(slam)  # reference only; Pallas-blind
    # tracker fires every kf_stride frames; BA/ingest FLOPs are <5% of the
    # tracker's and are not separately metered.
    flops_per_frame = tr_flops_analytic / cfg.slam.kf_stride
    mfu = flops_per_frame * fps / PEAK_FLOPS.get(backend, 1e12)

    print(json.dumps({
        "metric": "slam_fps_e2e",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": None,
        "reference_fps_estimate": REFERENCE_FPS_ESTIMATE,
        "config": "davis_demo (BUFFER_SIZE=1024, M=400, 480x640, "
                  f"{T - WARMUP_FRAMES} steady frames)",
        "backend": backend,
        "stage_ms": stage_ms,
        "tracker_gflops_per_call": round(tr_flops_analytic / 1e9, 1),
        "tracker_gflops_xla_metered": round(tr_flops_xla / 1e9, 1),
        "mfu": round(mfu, 4),
        "notes": "vs_baseline null: reference publishes no FPS "
                 "(BASELINE.md); reference_fps_estimate is a guess, not a "
                 "measurement. Measured software anchor (r5 config sweep, "
                 "scripts/ref_cpu_ab.py, idle host, steady-state frames): "
                 "the full reference loop vs ours on identical "
                 "CPU/scene/config is 10.5-14.7x IN OUR FAVOR across four "
                 "configs from toy to davis-proportioned (e.g. "
                 "M=256/S=12/RW=20: ours 8.78 vs reference 0.73 FPS), "
                 "flat as the padded:live edge ratio moves 1.0-1.6. The "
                 "r4 '0.42x' anchor is retired as an artifact: it timed "
                 "per-run jit re-tracing (~8 s fixed per fresh pipeline), "
                 "not the loop (ROOFLINE.md Reference comparison). "
                 "Measured on one TPU v5e chip via tunnel; "
                 "BASELINE.md target hardware is a v5p host. stage_ms are "
                 "amortised per-stage device times (single flush per rep "
                 "loop); predicted vs measured ms/2frames is the "
                 "consistency check. MFU uses the analytic FLOP model "
                 "(utils/flops.py); the XLA metering is Pallas-blind.",
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
