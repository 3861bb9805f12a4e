"""Stage-3 (dense global alignment) software A/B: reference RefineNet+Adam
vs ours on the SAME CPU, same synthetic results.pkl, same loss weights.

Complements scripts/ref_cpu_ab.py (stage-2 SLAM loop): stage 3 is pure
full-graph autodiff + Adam, so it isolates XLA's compiled
gradient/optimizer step against eager torch autograd with no
static-shape-padding asymmetry (both sides do dense work on identical
tensors). Production-proportioned shapes (T=30 frames, N=200 tracks,
S_local=12, 192x192 maps, 16x16 scale grid).

Per-iteration rates come from a two-point slope (niter=K vs 2K), which
cancels both sides' one-time costs (our jit trace/compile, the
reference's first-call autograd graph build).

Run on an IDLE machine (see ref_cpu_ab.py — eager torch is much more
contention-sensitive than the compiled loop).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/refine_cpu_ab.py
"""

import json
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T, N, S_LOCAL, H, W = 30, 200, 12, 192, 192
GRID = 16
WEIGHTS = {
    "spatial_loss": 5.0,
    "inter_frame_loss": 0.3,
    "pts_3d_loss": 1.0,
    "cam_smooth_vec_loss": 1.0,
    "scale_smoothness_loss": 0.3,
}
K_ITER = 40


def _make_results(rng):
    import numpy as np

    import jax.numpy as jnp
    from batrack_tpu.geometry import se3

    xy = rng.uniform(1.0, W - 2.0, (T, N, S_LOCAL, 2))
    disp = rng.uniform(0.2, 2.0, (T, N, S_LOCAL))
    trajs = np.concatenate([xy, disp[..., None]], axis=-1)
    vis = (rng.uniform(0, 1, (T, N, S_LOCAL)) > 0.25).astype(np.float64) * 0.95
    static = (rng.uniform(0, 1, (T, N, S_LOCAL)) > 0.3).astype(np.float64)
    ts = np.arange(T, dtype=np.float64)
    xi = np.stack(
        [0.05 * ts, 0.02 * np.sin(ts), 0.01 * ts,
         0.02 * np.sin(ts * 0.7), 0.015 * np.cos(ts * 0.5) - 0.015,
         0.01 * ts], -1)
    cams = np.asarray(se3.matrix(se3.exp(jnp.asarray(xi, jnp.float32))),
                      np.float64)
    intr = np.tile(np.array([150.0, 150.5, 96.0, 95.5]), (T, 1))
    res = {
        "trajs_2d_disp": trajs,
        "dmaps": rng.uniform(0.5, 3.0, (T, H, W, 1)),
        "cams_T_world": cams,
        "grid_query_frames": np.arange(0, T, 3, dtype=np.int64),
        "trajs_valid": np.ones((T, N), np.float64),
        "trajs_static": static,
        "trajs_vis": vis,
        "intrinsics": intr,
    }
    # f32 throughout: the reference net runs in float (the parity suite
    # .double()s it instead; here both sides run the production dtype)
    return {k: (v if k == "grid_query_frames" else v.astype(np.float32))
            for k, v in res.items()}


def main():
    import jax

    assert jax.default_backend() == "cpu", (
        "run with PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu — same-hardware "
        "software A/B"
    )
    import numpy as np

    from test_refine_ref_parity import _import_reference_refine

    rng = np.random.default_rng(3)
    results = _make_results(rng)

    # ---- reference (torch CPU, f32, eager autograd) -----------------------
    ref_refine, ref_trainer = _import_reference_refine()
    with tempfile.TemporaryDirectory() as td:
        pkl = os.path.join(td, "results.pkl")
        with open(pkl, "wb") as f:
            pickle.dump(results, f)

        def ref_run(niter):
            net = ref_refine.RefineNet(
                device="cpu", result_path=pkl, grid_size=GRID,
                align_depth=True, loss_weight_dict=WEIGHTS,
                refine_intrinsics=False, verbose=False,
            )
            t0 = time.perf_counter()
            ref_trainer.global_alignment_loop(
                net, lr=1e-2, niter=niter, schedule="cosine", lr_min=1e-6,
                fixed_pose=True, fixed_K=True,
            )
            return time.perf_counter() - t0

        t_ref_1 = ref_run(K_ITER)
        t_ref_2 = ref_run(2 * K_ITER)
    ref_it_s = K_ITER / (t_ref_2 - t_ref_1)

    # ---- ours (jitted value_and_grad + optax Adam) ------------------------
    from batrack_tpu.refine.refine_net import build_refine_data, init_params
    from batrack_tpu.refine.trainer import global_alignment_loop
    from batrack_tpu.utils.config import RefineConfig

    data = build_refine_data(results, align_depth=True, dtype=np.float32)

    def our_run(niter):
        # RefineConfig loss-weight defaults == WEIGHTS (the reference CLI
        # defaults both follow, run_global_refine.py:61-67)
        cfg = RefineConfig(
            grid_size=GRID, niter=niter, lr=1e-2, schedule="cosine",
            fixed_pose=True, fixed_K=True,
        )
        params = init_params(data, GRID, dtype=np.float32)
        t0 = time.perf_counter()
        global_alignment_loop(params, data, (H, W), cfg)
        return time.perf_counter() - t0

    t_our_1 = our_run(K_ITER)
    t_our_2 = our_run(2 * K_ITER)
    our_it_s = K_ITER / (t_our_2 - t_our_1)

    print(json.dumps({
        "metric": "refine_cpu_software_ab",
        "shapes": {"T": T, "N": N, "S_local": S_LOCAL, "HW": [H, W],
                   "grid": GRID},
        "reference_iters_per_s": round(ref_it_s, 3),
        "ours_iters_per_s": round(our_it_s, 3),
        "speedup_ours_vs_reference": round(our_it_s / ref_it_s, 2),
        "first_call_s": {"reference": round(t_ref_1, 2),
                         "ours_incl_compile": round(t_our_1, 2)},
        "notes": "two-point slope (niter=40 vs 80) cancels one-time costs "
                 "on both sides; fixed pose/K (the pypose pose param is "
                 "stubbed in this harness); full loss set. Same CPU, same "
                 "pickle, same weights. TPU rate for the same program: "
                 "bench_refine.py.",
    }))


if __name__ == "__main__":
    main()
