"""Tests for the evo-equivalent evaluation utilities."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from batrack_tpu.utils.evaluation import (
    ate_rmse,
    compute_depth_errors,
    eval_metrics,
    rpe,
    umeyama_alignment,
)


def random_traj(rng, n=40):
    ts = np.arange(n, dtype=float)
    xyz = np.cumsum(rng.normal(size=(n, 3)) * 0.1, axis=0)
    quat = Rotation.from_rotvec(rng.normal(size=(n, 3)) * 0.1).as_quat()  # xyzw
    return np.column_stack([xyz, quat[:, [3, 0, 1, 2]]]), ts


def apply_sim3(traj, R, t, s):
    out = traj.copy()
    out[:, :3] = s * traj[:, :3] @ R.T + t
    Rq = Rotation.from_matrix(R)
    q = Rotation.from_quat(traj[:, 3:][:, [1, 2, 3, 0]])
    q2 = (Rq * q).as_quat()
    out[:, 3:] = q2[:, [3, 0, 1, 2]]
    return out


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(50, 3))
    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    t = np.array([1.0, -2.0, 0.5])
    s = 2.5
    y = s * x @ R.T + t
    R2, t2, s2 = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(R2, R, atol=1e-6)
    np.testing.assert_allclose(t2, t, atol=1e-6)
    assert abs(s2 - s) < 1e-6


def test_ate_invariant_to_sim3(rng):
    traj, ts = random_traj(rng)
    R = Rotation.from_rotvec([0.2, 0.1, -0.4]).as_matrix()
    transformed = apply_sim3(traj, R, np.array([5.0, 1.0, -3.0]), 1.7)
    assert ate_rmse(transformed, traj) < 1e-5


def test_ate_measures_noise(rng):
    traj, ts = random_traj(rng)
    noisy = traj.copy()
    noisy[:, :3] += rng.normal(size=(len(traj), 3)) * 0.05
    err = ate_rmse(noisy, traj)
    assert 0.02 < err < 0.15


def test_rpe_zero_for_identical(rng):
    traj, ts = random_traj(rng)
    t_err, r_err = rpe(traj, traj)
    assert t_err < 1e-6 and r_err < 1e-2


def test_eval_metrics_end_to_end(rng, tmp_path):
    traj, ts = random_traj(rng)
    noisy = traj.copy()
    noisy[:, :3] += rng.normal(size=(len(traj), 3)) * 0.01
    ate, rpt, rpr = eval_metrics(
        (noisy, ts), (traj, ts), seq="test", filename=str(tmp_path / "m.txt")
    )
    assert 0 < ate < 0.05
    assert rpt >= 0 and rpr >= 0
    assert (tmp_path / "m.txt").exists()


def test_depth_metrics_perfect():
    gt = np.random.default_rng(0).uniform(1, 10, size=1000)
    errs = compute_depth_errors(gt, gt.copy())
    abs_rel, sq_rel, log10, rmse, rmse_log, a1, a2, a3 = errs
    assert abs_rel < 1e-6 and rmse < 1e-5
    assert a1 == a2 == a3 == 1.0


def test_depth_metrics_median_scaling():
    rng = np.random.default_rng(0)
    gt = rng.uniform(1, 10, size=1000)
    pred = gt * 3.0  # pure scale error is removed by median scaling
    errs = compute_depth_errors(gt, pred, scaling="median")
    assert errs[0] < 1e-6
