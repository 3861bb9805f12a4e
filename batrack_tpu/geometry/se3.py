"""SE(3) on quaternion+translation vectors, pure JAX.

Data layout: (..., 7) = [tx, ty, tz, qx, qy, qz, qw] — identical to the
reference's lietorch convention (main/backend/lietorch/groups.py:238-311) so
trajectories/buffers interop with files the reference pipeline writes.

Everything is a jittable, vmappable function over arbitrary leading dims; the
`SE3` wrapper class is a registered pytree for ergonomic call sites.

The reference implements these ops as templated CUDA kernels
(main/backend/lietorch/include/se3.h, src/lietorch_gpu.cu). On TPU the whole
group algebra is elementwise arithmetic that XLA fuses into neighbouring ops,
so no native kernel is needed or wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from batrack_tpu.geometry.quaternion import (
    hat,
    mm,
    matrix_to_quat,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_left_jacobian,
    so3_left_jacobian_inverse,
    so3_log,
)

_EPS = 1e-6


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    data = jnp.zeros(tuple(shape) + (7,), dtype)
    return data.at[..., 6].set(1.0)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    t, q = g[..., :3], g[..., 3:7]
    qinv = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qinv, t), qinv], axis=-1)


def mul(g1: jnp.ndarray, g2: jnp.ndarray) -> jnp.ndarray:
    t1, q1 = g1[..., :3], g1[..., 3:7]
    t2, q2 = g2[..., :3], g2[..., 3:7]
    q = quat_normalize(quat_mul(q1, q2))
    t = t1 + quat_rotate(q1, t2)
    return jnp.concatenate([t, q], axis=-1)


def act(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply to 3D point(s): R p + t."""
    return quat_rotate(g[..., 3:7], p) + g[..., :3]


def act4(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply to homogeneous 4-vector [x, y, z, w] -> [R v + w t, w].

    Mirrors lietorch act4 (include/se3.h), used by projective ops where w is
    the inverse depth.
    """
    v, w = p[..., :3], p[..., 3:4]
    xyz = quat_rotate(g[..., 3:7], v) + w * g[..., :3]
    return jnp.concatenate([xyz, jnp.broadcast_to(w, xyz.shape[:-1] + (1,))], axis=-1)


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: xi = [tau(3), phi(3)] -> SE3 vector."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, tau, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([t, q], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: SE3 vector -> [tau(3), phi(3)]."""
    t, q = g[..., :3], g[..., 3:7]
    phi = so3_log(q)
    Vinv = so3_left_jacobian_inverse(phi)
    tau = jnp.einsum("...ij,...j->...i", Vinv, t, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Retraction Exp(xi) * g (left-multiplicative, lietorch groups.py:153)."""
    return mul(exp(xi), g)


def adjoint_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """Adjoint as a (..., 6, 6) matrix, ordering [tau, phi].

    Adj = [[R, hat(t) R], [0, R]] so that  g * Exp(a) = Exp(Adj a) * g.
    """
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    tR = mm(hat(t), R)
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def adj(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Adjoint action Adj_g a on tangent vector(s) a (..., 6)."""
    tau, phi = a[..., :3], a[..., 3:6]
    q = g[..., 3:7]
    t = g[..., :3]
    Rphi = quat_rotate(q, phi)
    return jnp.concatenate([quat_rotate(q, tau) + jnp.cross(t, Rphi), Rphi], axis=-1)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Transposed adjoint Adj_g^T a — applied rowwise to gradient covectors.

    For a = [a_t, a_w]: [R^T a_t, R^T (a_w - t x a_t)]  (lietorch adjT).
    """
    a_t, a_w = a[..., :3], a[..., 3:6]
    t, q = g[..., :3], g[..., 3:7]
    qinv = quat_conj(q)
    top = quat_rotate(qinv, a_t)
    bot = quat_rotate(qinv, a_w - jnp.cross(t, a_t))
    return jnp.concatenate([top, bot], axis=-1)


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    """SE3 vector -> homogeneous (..., 4, 4) matrix."""
    t, q = g[..., :3], g[..., 3:7]
    R = quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous (..., 4, 4) matrix -> SE3 vector."""
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return jnp.concatenate([t, q], axis=-1)


def _se3_Q(tau: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Barfoot Q(tau, phi) block of the SE(3) left Jacobian."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    small = theta_sq < _EPS
    tsq = jnp.where(small, 1.0, theta_sq)  # guard untaken-branch denominators
    theta = jnp.sqrt(tsq)
    s, c = jnp.sin(theta), jnp.cos(theta)
    c1 = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - s) / (tsq * theta))
    c2 = jnp.where(small, 1.0 / 24.0 - theta_sq / 720.0,
                   (theta_sq / 2.0 + c - 1.0) / (tsq * tsq))
    c3 = jnp.where(small, 1.0 / 120.0 - theta_sq / 2520.0,
                   (theta - s - theta * theta_sq / 6.0) / (tsq ** 2 * theta))
    # c3 = (theta - sin - theta^3/6)/theta^5
    T = hat(tau)
    P = hat(phi)
    PT, TP = mm(P, T), mm(T, P)
    PTP = mm(mm(P, T), P)
    # Barfoot, State Estimation eq. 7.86: with c2 = (th^2/2 + cos - 1)/th^4
    # and c3 = (th - sin - th^3/6)/th^5 the 3rd and 4th terms carry PLUS
    # signs: +c2 (P^2 T + T P^2 - 3 PTP) + 1/2 (c2 + 3 c3)(PTP^2 + P^2 TP)
    # (verified against finite differences of exp to 1e-8)
    Q = (0.5 * T
         + c1 * (PT + TP + PTP)
         + c2 * (mm(P, PT) + mm(TP, P) - 3.0 * PTP)
         + 0.5 * (c2 + 3.0 * c3) * (mm(PTP, P) + mm(P, PTP)))
    return Q


def left_jacobian(xi: jnp.ndarray) -> jnp.ndarray:
    """SE(3) left Jacobian J_l(xi): (..., 6, 6)."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    J = so3_left_jacobian(phi)
    Q = _se3_Q(tau, phi)
    Z = jnp.zeros_like(J)
    top = jnp.concatenate([J, Q], axis=-1)
    bot = jnp.concatenate([Z, J], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def left_jacobian_inverse(xi: jnp.ndarray) -> jnp.ndarray:
    """Inverse SE(3) left Jacobian (lietorch Jinv equivalent)."""
    tau, phi = xi[..., :3], xi[..., 3:6]
    Ji = so3_left_jacobian_inverse(phi)
    Q = _se3_Q(tau, phi)
    JiQJi = mm(mm(Ji, Q), Ji)
    Z = jnp.zeros_like(Ji)
    top = jnp.concatenate([Ji, -JiQJi], axis=-1)
    bot = jnp.concatenate([Z, Ji], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@jax.tree_util.register_pytree_node_class
class SE3:
    """Thin lietorch-style wrapper over the functional API (groups.py:238)."""

    __slots__ = ("data",)

    def __init__(self, data: jnp.ndarray):
        self.data = data

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @property
    def shape(self):
        return self.data.shape[:-1]

    def __getitem__(self, idx):
        return SE3(self.data[idx])

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        return cls(identity(shape, dtype))

    @classmethod
    def exp(cls, xi):
        return cls(exp(xi))

    def log(self):
        return log(self.data)

    def inv(self):
        return SE3(inv(self.data))

    def __mul__(self, other):
        if isinstance(other, SE3):
            return SE3(mul(self.data, other.data))
        return self.act(other)

    def act(self, p):
        if p.shape[-1] == 4:
            return act4(self.data, p)
        return act(self.data, p)

    def retr(self, xi):
        return SE3(retr(self.data, xi))

    def adj(self, a):
        return adj(self.data, a)

    def adjT(self, a):
        return adjT(self.data, a)

    def matrix(self):
        return matrix(self.data)

    @classmethod
    def from_matrix(cls, m):
        return cls(from_matrix(m))

    def vec(self):
        return self.data

    def translation(self):
        return self.data[..., :3]
