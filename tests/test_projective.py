"""Tests for projective ops: FD validation of the analytic BA Jacobians.

These pin the Jacobian conventions the BA solver depends on
(reference main/backend/projective_ops.py:72-100): a wrong sign or
adjoint convention shows up as O(1) relative error here.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.geometry import projective, se3


@pytest.fixture
def problem(rng):
    n_frames, n_patches = 5, 48
    poses = se3.exp(jnp.asarray(rng.normal(size=(n_frames, 6)) * 0.1, jnp.float32))
    patches = jnp.asarray(
        np.stack(
            [
                rng.uniform(50, 500, n_patches),
                rng.uniform(50, 300, n_patches),
                rng.uniform(0.2, 2.0, n_patches),
            ],
            -1,
        ),
        jnp.float32,
    )
    intr = jnp.tile(jnp.asarray([400.0, 400.0, 320.0, 180.0], jnp.float32), (n_frames, 1))
    ii = jnp.asarray(rng.integers(0, n_frames, n_patches), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1 + rng.integers(0, n_frames - 1, n_patches)) % n_frames, jnp.int32)
    kk = jnp.arange(n_patches, dtype=jnp.int32)
    return poses, patches, intr, ii, jj, kk


def test_iproj_proj_roundtrip(rng):
    intr = jnp.asarray([[400.0, 400.0, 320.0, 180.0]] * 16, jnp.float32)
    patches = jnp.asarray(
        np.stack([rng.uniform(0, 640, 16), rng.uniform(0, 360, 16), rng.uniform(0.3, 3.0, 16)], -1),
        jnp.float32,
    )
    X = projective.iproj(patches, intr)
    out = projective.proj(X, intr, depth=True)
    np.testing.assert_allclose(out, patches, rtol=1e-5, atol=1e-3)


def test_transform_identity(problem):
    poses, patches, intr, ii, jj, kk = problem
    coords, valid, _ = projective.transform(poses, patches, intr, ii, ii, kk)
    # reprojecting into the source frame returns the original pixel
    np.testing.assert_allclose(coords, patches[:, :2], rtol=1e-4, atol=5e-2)


def test_jacobians_match_finite_differences(problem):
    poses, patches, intr, ii, jj, kk = problem
    coords, valid, jac = projective.transform(poses, patches, intr, ii, jj, kk, jacobian=True)
    scale = max(1.0, float(jnp.abs(jac.Jj).max()))
    eps = 1e-3

    def f(p, q):
        c, _, _ = projective.transform(p, q, intr, ii, jj, kk)
        return np.asarray(c)

    n_frames = poses.shape[0]
    # pose-j Jacobian: perturb each frame, compare on edges with jj == frame
    for frame in range(n_frames):
        for k in range(6):
            dxi = jnp.zeros((n_frames, 6)).at[frame, k].set(eps)
            fd = (f(se3.retr(poses, dxi), patches) - f(se3.retr(poses, -dxi), patches)) / (2 * eps)
            sel_j = np.asarray(jj) == frame
            err_j = np.abs(fd[sel_j] - np.asarray(jac.Jj)[sel_j, :, k]).max() if sel_j.any() else 0
            sel_i = np.asarray(ii) == frame
            err_i = np.abs(fd[sel_i] - np.asarray(jac.Ji)[sel_i, :, k]).max() if sel_i.any() else 0
            assert err_j / scale < 2e-3, (frame, k, err_j, scale)
            assert err_i / scale < 2e-3, (frame, k, err_i, scale)

    # depth Jacobian
    fd = (f(poses, patches.at[:, 2].add(eps)) - f(poses, patches.at[:, 2].add(-eps))) / (2 * eps)
    err = np.abs(fd - np.asarray(jac.Jz)[..., 0]).max()
    assert err / scale < 2e-3


def test_point_cloud_world_consistency(problem):
    poses, patches, intr, ii, jj, kk = problem
    # A world point back-projected from frame i and projected into frame i
    # must land on the original pixel.
    ix = ii
    P = projective.point_cloud(poses, patches, intr, ix)
    w2c = jnp.take(poses, ix, axis=0)
    X1 = se3.act4(w2c, P)
    out = projective.proj(X1, jnp.take(intr, ix, axis=0), depth=True)
    np.testing.assert_allclose(out, patches, rtol=1e-4, atol=5e-2)


def test_flow_mag_zero_for_identity(problem):
    poses, patches, intr, ii, jj, kk = problem
    same = projective.flow_mag(poses, patches, intr, ii, ii, kk, beta=0.5)
    np.testing.assert_allclose(same, 0.0, atol=1e-2)
