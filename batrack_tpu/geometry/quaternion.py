"""Quaternion primitives (scalar-last, [x, y, z, w]).

Pure-JAX, elementwise math: XLA vectorizes these onto the TPU VPU with no
custom kernels needed (the reference implements the same math as CUDA kernels
in main/backend/lietorch/src/lietorch_gpu.cu; on TPU the elementwise formulation
fuses into surrounding computation instead).

All functions broadcast over arbitrary leading dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Threshold below which Taylor expansions replace trig ratios.
_EPS = 1e-6


def mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small-matrix product at full fp32 precision.

    TPU MXU matmuls default to bf16 inputs; for 3x3/6x6 Lie-algebra math that
    costs ~1e-2 absolute error (measured) for zero speed benefit, so all
    geometry contractions pin Precision.HIGHEST.
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2, scalar-last convention."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector(s) v by unit quaternion(s) q.

    Uses the expanded form v + 2 qv x (qv x v + w v) which is cheaper than
    q * v * q^-1 and autodiff-friendly.
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix (appended dims (..., 3, 3))."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion (scalar-last), branch-free.

    Uses the four-candidate construction (one per largest diagonal combo) and
    selects the numerically best via where-chains, so it is jit/vmap safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Candidate squared-magnitudes (4 * q_i^2).
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    # Branch w: q = [ (m21-m12)/s, (m02-m20)/s, (m10-m01)/s, s/4 ] with s=2*sqrt(qw2)
    sw = 2.0 * safe_sqrt(qw2)
    qw_w = jnp.stack([(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], -1)
    sx = 2.0 * safe_sqrt(qx2)
    qw_x = jnp.stack([0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1)
    sy = 2.0 * safe_sqrt(qy2)
    qw_y = jnp.stack([(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], -1)
    sz = 2.0 * safe_sqrt(qz2)
    qw_z = jnp.stack([(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    q = jnp.where(best == 0, qw_w, jnp.where(best == 1, qw_x, jnp.where(best == 2, qw_y, qw_z)))
    return quat_normalize(q)


# --------------------------------------------------------------------------
# SO(3) exp / log and left-Jacobian helpers
# --------------------------------------------------------------------------

def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle 3-vector -> unit quaternion, stable near zero."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    half = 0.5 * theta
    # sin(theta/2)/theta: Taylor 1/2 - theta^2/48
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([k * phi, w], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> axis-angle 3-vector (matches lietorch convention).

    ATAN-based (so3.h:115-151, Hertzberg et al. via Sophus), NOT atan2: with
    2*atan(n/w)/n the result is hemisphere-invariant (log(-q) == log(q),
    always the short rotation, |angle| <= pi). An atan2 formulation returns
    the ~2pi representation for w < 0, which is discontinuous against the
    Taylor branch and explodes downstream Jinv terms (sin(theta/2) ~ 0)."""
    qv = q[..., :3]
    w = q[..., 3:4]
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = n_sq < _EPS
    n = jnp.sqrt(jnp.where(small, 1.0, n_sq))
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    k_big = jnp.where(
        jnp.abs(w) < 1e-12,
        jnp.where(w >= 0, jnp.pi, -jnp.pi) / n,
        2.0 * jnp.arctan(n / w_safe) / n,
    )
    # Taylor: 2/w - 2 n^2/(3 w^3) (valid for either sign of w)
    k = jnp.where(small, 2.0 / w_safe - 2.0 * n_sq / (3.0 * w_safe**3), k_big)
    return k * qv


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix (..., 3, 3)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    m = jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def _so3_left_jacobian_coeffs(theta_sq: jnp.ndarray):
    """Coefficients (a, b) for V = I + a*hat + b*hat^2, stable near zero.

    Untaken `where` branches are evaluated AND differentiated by autodiff, so
    their denominators must be guarded (the double-where trick) or gradients
    at theta = 0 become NaN.
    """
    small = theta_sq < _EPS
    tsq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(tsq)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / tsq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (tsq * theta))
    return a, b


def so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian V(phi): (..., 3, 3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    a, b = _so3_left_jacobian_coeffs(theta_sq)
    P = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), P.shape)
    return eye + a * P + b * mm(P, P)


def so3_left_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SO(3) left Jacobian V^-1(phi): (..., 3, 3)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < _EPS
    tsq = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(tsq)
    half = 0.5 * theta
    # c = 1/theta^2 - cos(theta/2)/(2 theta sin(theta/2));  Taylor: 1/12 + theta^2/720
    cot = jnp.cos(half) / jnp.where(small, 1.0, jnp.sin(half))
    c = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0,
                  1.0 / tsq - cot / (2.0 * theta))
    P = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), P.shape)
    return eye - 0.5 * P + c * mm(P, P)
