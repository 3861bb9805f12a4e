"""Golden end-to-end regression fixture (VERDICT r1 #6).

One deterministic synthetic scene driven through the WHOLE pipeline —
SLAM (oracle tracker) -> terminate -> results.pkl -> dense refinement ->
depth evaluation — with the trajectory and depth metrics pinned against
tests/fixtures/golden_pipeline.npz. Any numeric drift > 1e-3 in a later
round fails here.

Regenerate the fixture after an INTENTIONAL numeric change with:
    python tests/test_golden_pipeline.py --regen
(then justify the change in the commit message).
"""

import os
import pickle
import sys

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_pipeline.npz")


def _run_pipeline(tmp_dir):
    from test_slam_e2e import (
        INTR, T_FRAMES, gt_trajectory, plane_depth, small_config, HT, WD,
    )

    from batrack_tpu.slam import BATrack, OracleTracker, StaticDims

    rng = np.random.default_rng(3)
    poses_gt = gt_trajectory(T_FRAMES)
    depths = np.stack([plane_depth(p) for p in poses_gt])
    images = rng.uniform(0, 255, size=(T_FRAMES, HT, WD, 3)).astype(np.float32)

    cfg = small_config()
    dims = StaticDims.from_config(cfg, HT, WD)
    slam = BATrack(cfg, HT, WD, seed=0)
    slam.tracker = OracleTracker(poses_gt, INTR, dims, noise=0.05)
    for t in range(T_FRAMES):
        slam(t, images[t], depths[t], INTR)

    traj, _ = slam.terminate()

    # gt-depth maps perturbed 2% stand in for mono-depth priors
    dmaps = depths * rng.normal(1.0, 0.02, depths.shape).astype(np.float32)
    result_path = os.path.join(tmp_dir, "results.pkl")
    slam.get_results(rgbs=images, dmaps=dmaps, dmaps_gt=depths,
                     save_path=result_path)

    # ---- stage 3: dense refinement on the saved pickle
    from batrack_tpu.cli.run_refine import refine_scene
    from batrack_tpu.utils.config import RefineConfig

    refined = refine_scene(
        result_path, RefineConfig(grid_size=4, niter=30), verbose=False
    )
    refined_path = os.path.join(tmp_dir, "results_refined.pkl")
    with open(refined_path, "wb") as f:
        pickle.dump(refined, f)

    # ---- depth eval on the refined maps
    from batrack_tpu.utils.evaluation import eval_depth_maps

    metrics = eval_depth_maps(
        depths, np.asarray(refined["dmaps_scaled"])[..., 0], scaling="median"
    )
    return traj, np.asarray(metrics, np.float64), refined


def _generate(path):
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        traj, metrics, _ = _run_pipeline(td)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, traj=traj, depth_metrics=metrics)
    print(f"wrote {path}\n  traj[0]: {traj[0]}\n  metrics: {metrics}")


@pytest.mark.slow
def test_golden_pipeline(tmp_path):
    assert os.path.exists(FIXTURE), (
        "fixture missing - run: python tests/test_golden_pipeline.py --regen"
    )
    ref = np.load(FIXTURE)
    traj, metrics, refined = _run_pipeline(str(tmp_path))

    # trajectory pinned (TUM c2w rows)
    np.testing.assert_allclose(traj, ref["traj"], atol=1e-3)
    # depth metrics pinned (abs_rel..a3)
    np.testing.assert_allclose(metrics, ref["depth_metrics"], atol=1e-3)
    # schema of the refined pickle (stage-4 visualizers consume these)
    assert refined["dmaps_scaled"].shape == refined["dmaps"].shape
    assert np.isfinite(np.asarray(refined["cams_T_world"])).all()


if __name__ == "__main__":
    if "--regen" in sys.argv:
        # regenerate under the SAME environment the pytest run compares in
        # (the virtual 8-device CPU mesh): a fixture generated on another
        # backend drifts past the 1e-3 pins through the chaotic pipeline
        if os.environ.get("_BATRACK_TPU_TEST_REEXEC") != "1":
            env = dict(os.environ)
            env["_BATRACK_TPU_TEST_REEXEC"] = "1"
            env["PALLAS_AXON_POOL_IPS"] = ""
            env["JAX_PLATFORMS"] = "cpu"
            flags = env.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                env["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count=8"
                ).strip()
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        sys.path.insert(0, os.path.dirname(__file__))
        _generate(FIXTURE)
    else:
        print(__doc__)
