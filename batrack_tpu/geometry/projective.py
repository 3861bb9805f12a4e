"""Projective geometry ops: pinhole (un)projection and SE3 patch transforms
with analytic Jacobians.

Semantics mirror the reference main/backend/projective_ops.py:19-175 (iproj,
proj, transform, point_cloud, flow_mag, back_proj, proj_to_frames), rebuilt as
pure-JAX functions over flat edge arrays. The patch size is 1 in the executed
reference pipeline (batrack.py:45 `self.P = 1`), so patches here are plain
(..., 3) center points [x, y, inverse_depth].

All index gathering (patches[kk], poses[ii]) happens inside `transform` with
`jnp.take`, which XLA lowers to efficient TPU gathers.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from batrack_tpu.geometry import se3

MIN_DEPTH = 0.2  # projective_ops.py:6


def iproj(patches: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Inverse projection: [x, y, d] pixel + inv-depth -> homogeneous ray.

    Returns [xn, yn, 1, d] (projective_ops.py:19-29).
    """
    x, y, d = patches[..., 0], patches[..., 1], patches[..., 2]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    xn = (x - cx) / fx
    yn = (y - cy) / fy
    return jnp.stack([xn, yn, jnp.ones_like(d), d], axis=-1)


def proj(X: jnp.ndarray, intrinsics: jnp.ndarray, depth: bool = False) -> jnp.ndarray:
    """Pinhole projection of homogeneous [X, Y, Z, W] (projective_ops.py:32-52)."""
    Xs, Ys, Zs, Ws = X[..., 0], X[..., 1], X[..., 2], X[..., 3]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    d = 1.0 / jnp.maximum(Zs, 1e-2)
    x = fx * (d * Xs) + cx
    y = fy * (d * Ys) + cy
    if depth:
        return jnp.stack([x, y, d * Ws], axis=-1)
    return jnp.stack([x, y], axis=-1)


class TransformJacobians(NamedTuple):
    Ji: jnp.ndarray  # (E, 2, 6) d(residual)/d(pose_i tangent)
    Jj: jnp.ndarray  # (E, 2, 6) d(residual)/d(pose_j tangent)
    Jz: jnp.ndarray  # (E, 2, 1) d(residual)/d(inverse depth)


def transform(
    poses: jnp.ndarray,        # (N, 7) SE3 world-to-camera
    patches: jnp.ndarray,      # (K, 3) [x, y, inv_depth]
    intrinsics: jnp.ndarray,   # (N, 4) [fx, fy, cx, cy]
    ii: jnp.ndarray,           # (E,) source frame of each edge
    jj: jnp.ndarray,           # (E,) target frame of each edge
    kk: jnp.ndarray,           # (E,) patch index of each edge
    jacobian: bool = False,
    depth: bool = False,
    tonly: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[TransformJacobians]]:
    """Reproject patch kk from frame ii into frame jj.

    Mirrors projective_ops.py:54-105 including the Jacobian layout used by the
    BA solver: Jj is the derivative of the projected pixel wrt a *left*
    perturbation Exp(xi)*G_j of pose j, Ji = -AdjT(G_ij) Jj, and Jz is wrt the
    patch inverse depth. Returns (coords, valid, jacobians|None) where valid
    is the (Z > MIN_DEPTH) gate.
    """
    X0 = iproj(jnp.take(patches, kk, axis=0), jnp.take(intrinsics, ii, axis=0))

    Gi = jnp.take(poses, ii, axis=0)
    Gj = jnp.take(poses, jj, axis=0)
    Gij = se3.mul(Gj, se3.inv(Gi))
    if tonly:
        # zero the rotation (projective_ops.py:63-64)
        Gij = jnp.concatenate(
            [Gij[..., :3], jnp.zeros_like(Gij[..., 3:6]), jnp.ones_like(Gij[..., 6:7])],
            axis=-1,
        )

    X1 = se3.act4(Gij, X0)
    intr_j = jnp.take(intrinsics, jj, axis=0)
    x1 = proj(X1, intr_j, depth=depth)

    valid = (X1[..., 2] > MIN_DEPTH).astype(X1.dtype)

    if not jacobian:
        return x1, valid, None

    X, Y, Z, H = X1[..., 0], X1[..., 1], X1[..., 2], X1[..., 3]
    o = jnp.zeros_like(H)
    fx, fy = intr_j[..., 0], intr_j[..., 1]

    d = jnp.where(jnp.abs(Z) > MIN_DEPTH, 1.0 / jnp.where(jnp.abs(Z) > MIN_DEPTH, Z, 1.0), 0.0)

    # d(Exp(xi) X1)/dxi rows for [X, Y, Z] (projective_ops.py:83-88)
    Ja = jnp.stack(
        [
            jnp.stack([H, o, o, o, Z, -Y], axis=-1),
            jnp.stack([o, H, o, -Z, o, X], axis=-1),
            jnp.stack([o, o, H, Y, -X, o], axis=-1),
        ],
        axis=-2,
    )  # (E, 3, 6)

    # d(proj)/d(X1) rows for [x, y] against [X, Y, Z] (projective_ops.py:90-93)
    Jp = jnp.stack(
        [
            jnp.stack([fx * d, o, -fx * X * d * d], axis=-1),
            jnp.stack([o, fy * d, -fy * Y * d * d], axis=-1),
        ],
        axis=-2,
    )  # (E, 2, 3)

    Jj_ = jnp.einsum("...ij,...jk->...ik", Jp, Ja, precision=jax.lax.Precision.HIGHEST)  # (E, 2, 6)
    Ji_ = -se3.adjT(Gij[..., None, :], Jj_)

    # Jz = Jp @ (Gij.matrix()[:, :3, 3:]) : translation column (proj_ops.py:98)
    tcol = Gij[..., :3]  # translation of Gij = matrix()[:3, 3]
    Jz_ = jnp.einsum("...ij,...j->...i", Jp, tcol, precision=jax.lax.Precision.HIGHEST)[..., None]  # (E, 2, 1)

    return x1, valid, TransformJacobians(Ji_, Jj_, Jz_)


def point_cloud(
    poses: jnp.ndarray, patches: jnp.ndarray, intrinsics: jnp.ndarray, ix: jnp.ndarray
) -> jnp.ndarray:
    """Back-project patches into world space (projective_ops.py:107-109).

    Returns homogeneous (K, 4); world xyz = out[..., :3] / out[..., 3:].
    """
    G_inv = se3.inv(jnp.take(poses, ix, axis=0))
    return se3.act4(G_inv, iproj(patches, jnp.take(intrinsics, ix, axis=0)))


def flow_mag(
    poses: jnp.ndarray,
    patches: jnp.ndarray,
    intrinsics: jnp.ndarray,
    ii: jnp.ndarray,
    jj: jnp.ndarray,
    kk: jnp.ndarray,
    beta: float = 0.3,
) -> jnp.ndarray:
    """Blended full/translation-only flow magnitude (projective_ops.py:112-122)."""
    coords0, _, _ = transform(poses, patches, intrinsics, ii, ii, kk)
    coords1, _, _ = transform(poses, patches, intrinsics, ii, jj, kk)
    coords2, _, _ = transform(poses, patches, intrinsics, ii, jj, kk, tonly=True)
    flow1 = jnp.linalg.norm(coords1 - coords0, axis=-1)
    flow2 = jnp.linalg.norm(coords2 - coords0, axis=-1)
    return beta * flow1 + (1.0 - beta) * flow2


def back_proj(
    xy: jnp.ndarray, xy_depth: jnp.ndarray, intrinsics: jnp.ndarray,
    cams_c2w: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pixels + depth -> homogeneous world/camera points (projective_ops.py:129-149)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    X = (xy[..., 0] - cx[..., None]) / fx[..., None]
    Y = (xy[..., 1] - cy[..., None]) / fy[..., None]
    D = xy_depth[..., 0]
    P = jnp.stack([X * D, Y * D, D, jnp.ones_like(X)], axis=-1)
    if cams_c2w is not None:
        P = jnp.einsum("...ij,...nj->...ni", cams_c2w, P)
    return P


def proj_to_frames(
    P: jnp.ndarray, intrinsics: jnp.ndarray, cams_w2c: jnp.ndarray
) -> jnp.ndarray:
    """Project world points into a set of frames (projective_ops.py:151-175)."""
    P_c = jnp.einsum("...sij,...nj->...sni", cams_w2c, P)
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    d = 1.0 / P_c[..., 2]
    x = fx[..., None] * (P_c[..., 0] * d) + cx[..., None]
    y = fy[..., None] * (P_c[..., 1] * d) + cy[..., None]
    return jnp.stack([x, y], axis=-1)
