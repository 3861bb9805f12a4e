"""Software-efficiency bound: the reference SLAM loop vs ours on the SAME
CPU, swept over configs (VERDICT r3 #6, r4 #1).

The reference publishes no FPS and its A40 is unavailable here, but the
parity harness already runs the full reference BATRACK (torch CPU, real
ba.py/batrack.py) end-to-end. Timing both loops on identical hardware, same
scene, same config, same oracle tracker isolates the SLAM/BA machinery's
software efficiency. (It is NOT an A40-vs-TPU statement: the tracker is
oracle-stubbed on both sides and torch-CPU is not CUDA.)

r5 extends the single toy measurement to a CONFIG SWEEP that records, per
config, the FPS ratio alongside the measured padded:live edge-work ratio —
our static-shape loop processes its full edge-ring capacity E_CAP every BA
pass, the reference processes exactly the edges it holds (len(slam.ii),
instrumented below). The r4 claim was that the 0.42x toy anchor is the
padding at its proportional worst and the ratio closes as padded:live
improves; this script measures that trend instead of arguing it.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/ref_cpu_ab.py
       [--configs toy,mid,large,exactfit]

Run on an IDLE machine: both loops use all host cores, and eager torch
degrades far more under core contention than the compiled XLA loop (a run
concurrent with the pytest suite measured reference 0.63 FPS; concurrent
XLA compiles measured 4.96; truly idle measures 10.4-10.9 — up to 17x
distortion that flatters us).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# name -> harness overrides. kf_stride=2 everywhere (the production value).
# - toy:      the r4 anchor config (padding at its proportional worst).
# - mid/large: padded:live improves as S_slam/RW grow toward davis_demo
#   proportions (S=12, RW=20 IS the davis_demo window geometry).
# - exactfit: RW >> S so each ring block stays ~fully live for ~all of its
#   ring residency -> padded:live ~= 1; isolates the static-shape padding
#   term from everything else (kernel storm, assembly formulation, ...).
CONFIGS = {
    "toy": dict(M=64, S_SLAM=4, RW=6, OPT=5, BUFFER=64, T_FRAMES=32),
    "mid": dict(M=128, S_SLAM=8, RW=12, OPT=10, BUFFER=64, T_FRAMES=48),
    "large": dict(M=256, S_SLAM=12, RW=20, OPT=15, BUFFER=80, T_FRAMES=64),
    "exactfit": dict(M=64, S_SLAM=4, RW=48, OPT=5, BUFFER=112, T_FRAMES=96),
}


def _apply(T, cfg):
    for k, v in cfg.items():
        setattr(T, k, v)
    T.NUM_INIT = cfg["S_SLAM"]


def _scene(T):
    import numpy as np

    import jax.numpy as jnp
    from batrack_tpu.geometry import se3
    from batrack_tpu.utils.synth import parity_scene

    ts = np.arange(T.T_FRAMES, dtype=np.float32)
    return parity_scene(ts, T.HT, T.WD, T.INTR, se3, jnp, plane_z=T.PLANE_Z)


def _e_cap(T):
    """Static edge capacity of our loop at the current harness config."""
    from batrack_tpu.slam import StaticDims

    dims = StaticDims.from_config(T._our_cfg(), T.HT, T.WD)
    return dims.ring_slots * dims.edges_per_slot


def _steady_fps(frame_times, num_init):
    """Per-frame FPS over the steady tail of ONE run.

    The first frames of our run pay one-time jit trace/lower per stage (the
    XLA executables are compile-cached, but a fresh BATrack re-traces; a
    production process pays this once, not per sequence) and the
    reference's first frames skip the BA — both sides therefore measure
    FPS over the identical steady window: after num_init + 6 frames, by
    which every jit has fired and every update runs the full dual BA."""
    k = num_init + 6
    if len(frame_times) <= k + 4:
        k = len(frame_times) // 2
    span = frame_times[-1] - frame_times[k]
    return (len(frame_times) - 1 - k) / span


def run_config(T, name, cfg):
    import numpy as np

    _apply(T, cfg)
    scene = _scene(T)
    frames = T.T_FRAMES

    # ours: first run compiles (excluded), second run is timed; whole-run
    # time still includes ~7 s of per-run jit RE-TRACING for the fresh
    # BATrack instance (measured: warm runs at T=16 and T=32 both cost ~8 s
    # — the marginal frame cost is what the steady window isolates)
    t0 = time.perf_counter()
    T._run_ours(scene, {})
    ours_cold = time.perf_counter() - t0
    ours_ft = [time.perf_counter()]
    T._run_ours(scene, {}, frame_times=ours_ft)
    ours_warm = ours_ft[-1] - ours_ft[0]
    ours_steady = _steady_fps(ours_ft, cfg["S_SLAM"])

    # reference pass 1 (cold, instrumented): record the exact edge count the
    # reference BA processes at every update() call — the live-work
    # denominator of the padded:live ratio
    T._install_loop_stubs()
    from main.batrack import BATRACK

    live_counts = []
    orig_update = BATRACK.update

    def counting_update(self):
        live_counts.append(int(self.ii.shape[0]))
        return orig_update(self)

    BATRACK.update = counting_update
    try:
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            T._run_reference(scene, td, {})
            ref_cold = time.perf_counter() - t0
    finally:
        BATRACK.update = orig_update

    # reference pass 2 (warm, clean): the timed number
    ref_ft = [time.perf_counter()]
    with tempfile.TemporaryDirectory() as td:
        T._run_reference(scene, td, {}, frame_times=ref_ft)
    ref_warm = ref_ft[-1] - ref_ft[0]
    ref_steady = _steady_fps(ref_ft, cfg["S_SLAM"])

    e_cap = _e_cap(T)
    live = np.asarray(live_counts, float)
    steady = live[len(live) // 2:]
    row = {
        "config": name,
        "knobs": dict(cfg, kf_stride=2, ITER=2),
        "frames": frames,
        "ours_steady_fps": round(ours_steady, 2),
        "reference_steady_fps": round(ref_steady, 2),
        "steady_ratio_ours_over_ref": round(ours_steady / ref_steady, 3),
        "ours_fps_whole_run": round(frames / ours_warm, 2),
        "reference_fps_whole_run": round(frames / ref_warm, 2),
        "ours_cold_s": round(ours_cold, 1),
        "ref_cold_s": round(ref_cold, 1),
        "edge_capacity_ours": int(e_cap),
        "ref_live_edges_mean": round(float(live.mean()), 1),
        "ref_live_edges_steady_mean": round(float(steady.mean()), 1),
        "ref_live_edges_max": int(live.max()),
        "padded_to_live_mean": round(e_cap / float(live.mean()), 2),
        "padded_to_live_steady": round(e_cap / float(steady.mean()), 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="toy,mid,large,exactfit")
    args = ap.parse_args()

    import jax

    assert jax.default_backend() == "cpu", (
        "run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — this is a "
        "same-hardware software A/B, not a TPU benchmark"
    )
    import test_slam_ref_parity as T

    rows = [run_config(T, n, CONFIGS[n]) for n in args.configs.split(",")]
    summary = {
        "metric": "slam_loop_cpu_software_ab_sweep",
        "rows": [{k: r[k] for k in ("config", "ours_steady_fps",
                                    "reference_steady_fps",
                                    "steady_ratio_ours_over_ref",
                                    "padded_to_live_mean",
                                    "padded_to_live_steady")} for r in rows],
        "notes": "identical CPU, identical scene/config/oracle per row; "
                 "isolates the SLAM/BA machinery (XLA-compiled static-shape "
                 "loop vs the reference's eager torch exact-size loop), "
                 "steady-state frames only (both sides' warm-up excluded — "
                 "our per-run jit retrace and the reference's pre-init "
                 "frames). padded_to_live = our static edge capacity / the "
                 "instrumented count of edges the reference actually "
                 "processes per BA update. Not an A40 measurement.",
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
