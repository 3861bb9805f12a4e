"""Synthetic bundle-adjustment tests (SURVEY.md §4b: generate poses+points,
perturb, assert convergence — absent in the reference, added here)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.ba import BAProblem, ba_iteration
from batrack_tpu.geometry import projective, se3

N_FRAMES = 8
M = 12  # patches per frame
W = 8   # pose window
PATCH_WINDOW = 8


def make_problem(rng, pose_noise=0.0, depth_noise=0.0, alpha=0.0, loss="trivial"):
    """Synthetic scene: smooth forward trajectory, random landmarks."""
    intr = jnp.tile(jnp.asarray([300.0, 300.0, 320.0, 180.0], jnp.float32), (N_FRAMES, 1))

    # ground-truth world-to-camera trajectory: small increments
    xs = np.cumsum(rng.normal(size=(N_FRAMES, 6)) * 0.03, axis=0).astype(np.float32)
    xs[0] = 0.0
    gt_poses = se3.exp(jnp.asarray(xs))

    # landmarks: sample pixels + depths in each source frame
    px = rng.uniform(200, 440, size=(N_FRAMES, M)).astype(np.float32)
    py = rng.uniform(100, 260, size=(N_FRAMES, M)).astype(np.float32)
    depth = rng.uniform(2.0, 6.0, size=(N_FRAMES, M)).astype(np.float32)
    gt_patches = jnp.asarray(
        np.stack([px, py, 1.0 / depth], -1).reshape(N_FRAMES * M, 3)
    )

    # edges: every patch into every frame
    kk, jj = np.meshgrid(np.arange(N_FRAMES * M), np.arange(N_FRAMES), indexing="ij")
    kk = kk.reshape(-1).astype(np.int32)
    jj = jj.reshape(-1).astype(np.int32)
    ii = (kk // M).astype(np.int32)
    kk, jj, ii = jnp.asarray(kk), jnp.asarray(jj), jnp.asarray(ii)

    targets, valid, _ = projective.transform(gt_poses, gt_patches, intr, ii, jj, kk)

    poses0 = se3.retr(
        gt_poses,
        jnp.asarray(rng.normal(size=(N_FRAMES, 6)) * pose_noise, jnp.float32)
        .at[0]
        .set(0.0),
    )
    disp0 = gt_patches[:, 2] * jnp.asarray(
        np.exp(rng.normal(size=(N_FRAMES * M,)) * depth_noise), jnp.float32
    )
    patches0 = gt_patches.at[:, 2].set(disp0)

    prob = BAProblem(
        poses=poses0,
        patches=patches0,
        monodisp=gt_patches[:, 2],
        intrinsics=intr,
        targets=targets,
        weights=jnp.ones_like(targets),
        ii=ii,
        jj=jj,
        kk=kk,
        valid=valid,
        t0=jnp.asarray(1, jnp.int32),
        n=jnp.asarray(N_FRAMES, jnp.int32),
        base_k=jnp.asarray(0, jnp.int32),
    )
    step = functools.partial(
        ba_iteration,
        window=W,
        patch_window=PATCH_WINDOW,
        patches_per_frame=M,
        bounds=(0.0, 0.0, 640.0, 360.0),
        ep=0.01,
        lmbda=1e-4,
        alpha=alpha,
        loss=loss,
    )
    return prob, gt_poses, gt_patches, step


def mean_reproj_error(prob):
    coords, v, _ = projective.transform(
        prob.poses, prob.patches, prob.intrinsics, prob.ii, prob.jj, prob.kk
    )
    err = jnp.linalg.norm(prob.targets - coords, axis=-1) * v
    return float(err.sum() / v.sum())


def test_pose_recovery(rng):
    prob, gt_poses, _, step = make_problem(rng, pose_noise=0.02)
    assert mean_reproj_error(prob) > 1.0
    for _ in range(12):
        poses, patches = step(prob)
        prob = prob._replace(poses=poses, patches=patches)
    assert mean_reproj_error(prob) < 5e-2
    # gauge: first pose fixed; compare relative poses to gt
    rel = se3.mul(prob.poses, se3.inv(prob.poses[:1]))
    rel_gt = se3.mul(gt_poses, se3.inv(gt_poses[:1]))
    err = np.abs(np.asarray(se3.log(se3.mul(rel, se3.inv(rel_gt)))))
    # monocular BA has a global scale gauge: translations drift a little,
    # rotations must be recovered exactly.
    assert err[:, 3:].max() < 1e-3, err[:, 3:].max()
    assert err[:, :3].max() < 5e-2, err[:, :3].max()


def test_structure_only_recovery(rng):
    prob, _, gt_patches, step = make_problem(rng, depth_noise=0.15)
    for _ in range(20):
        poses, patches = step(prob, structure_only=True)
        np.testing.assert_allclose(poses, prob.poses)  # poses untouched
        prob = prob._replace(patches=patches)
    rel = np.asarray(prob.patches[:, 2] / gt_patches[:, 2])
    np.testing.assert_allclose(rel, 1.0, atol=2e-2)


def test_joint_recovery_with_prior(rng):
    prob, gt_poses, gt_patches, step = make_problem(
        rng, pose_noise=0.01, depth_noise=0.1, alpha=0.05, loss="huber"
    )
    for _ in range(25):
        poses, patches = step(prob)
        prob = prob._replace(poses=poses, patches=patches)
        poses, patches = step(prob, structure_only=True)
        prob = prob._replace(poses=poses, patches=patches)
    assert mean_reproj_error(prob) < 0.1


def test_invalid_edges_are_ignored(rng):
    prob, _, _, step = make_problem(rng, pose_noise=0.02)
    # corrupt half the targets but mark those edges invalid
    E = prob.targets.shape[0]
    bad = jnp.arange(E) % 2 == 0
    # +30 px, not more: a huge corruption would also trip the flow<250 gate
    # and the test would pass for the wrong reason
    targets_bad = jnp.where(bad[:, None], prob.targets + 30.0, prob.targets)
    prob_bad = prob._replace(targets=targets_bad, valid=prob.valid * (1.0 - bad))

    p1, q1 = step(prob._replace(valid=prob.valid * (1.0 - bad)))
    p2, q2 = step(prob_bad)
    np.testing.assert_allclose(p1, p2, atol=1e-6)
    np.testing.assert_allclose(q1, q2, atol=1e-6)


def test_fixed_poses_not_updated(rng):
    prob, _, _, step = make_problem(rng, pose_noise=0.02)
    prob = prob._replace(t0=jnp.asarray(3, jnp.int32))
    poses, _ = step(prob)
    np.testing.assert_allclose(poses[:3], prob.poses[:3], atol=1e-7)
    assert np.abs(np.asarray(poses[3:]) - np.asarray(prob.poses[3:])).max() > 1e-5


def test_patch_window_offset(rng):
    """base_k > 0: only patches inside the window get depth updates."""
    prob, _, _, step = make_problem(rng, depth_noise=0.2)
    base = 2 * M
    prob2 = prob._replace(base_k=jnp.asarray(base, jnp.int32))
    _, patches = step(prob2, structure_only=True)
    # patches before the window are untouched (modulo global clamp)
    np.testing.assert_allclose(patches[:base, 2], jnp.clip(prob.patches[:base, 2], 1e-3, 10.0), atol=1e-7)
    assert np.abs(np.asarray(patches[base:, 2]) - np.asarray(prob.patches[base:, 2])).max() > 1e-4


def test_jit_no_recompile_across_counts(rng):
    """The solver must be jittable with traced t0/n/base_k (no recompiles as
    the SLAM window advances)."""
    prob, _, _, _ = make_problem(rng, pose_noise=0.01)
    calls = {"n": 0}

    @jax.jit
    def step(prob):
        calls["n"] += 1
        return ba_iteration(
            prob,
            window=W,
            patch_window=PATCH_WINDOW,
            patches_per_frame=M,
            bounds=(0.0, 0.0, 640.0, 360.0),
        )

    for t0 in [1, 2, 3]:
        step(prob._replace(t0=jnp.asarray(t0, jnp.int32),
                           base_k=jnp.asarray(t0 * M, jnp.int32)))
    assert calls["n"] == 1
