"""RxSO(3) and Sim(3) groups, pure JAX.

Layouts follow lietorch (main/backend/lietorch/groups.py:249-311):
  RxSO3: (..., 5) = [qx, qy, qz, qw, s]
  Sim3:  (..., 8) = [tx, ty, tz, qx, qy, qz, qw, s]

Tangent ordering: RxSO3 [phi(3), sigma(1)]; Sim3 [tau(3), phi(3), sigma(1)].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from batrack_tpu.geometry.quaternion import (
    hat,
    mm,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_log,
)

_EPS = 1e-6


# --------------------------------------------------------------------------
# RxSO3
# --------------------------------------------------------------------------

def rxso3_identity(shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(shape) + (5,), dtype)
    return data.at[..., 3].set(1.0).at[..., 4].set(1.0)


def rxso3_exp(xi):
    phi, sigma = xi[..., :3], xi[..., 3:4]
    return jnp.concatenate([so3_exp(phi), jnp.exp(sigma)], axis=-1)


def rxso3_log(g):
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([so3_log(q), jnp.log(s)], axis=-1)


def rxso3_inv(g):
    q, s = g[..., :4], g[..., 4:5]
    return jnp.concatenate([quat_conj(q), 1.0 / s], axis=-1)


def rxso3_mul(g1, g2):
    q1, s1 = g1[..., :4], g1[..., 4:5]
    q2, s2 = g2[..., :4], g2[..., 4:5]
    return jnp.concatenate([quat_normalize(quat_mul(q1, q2)), s1 * s2], axis=-1)


def rxso3_act(g, p):
    return g[..., 4:5] * quat_rotate(g[..., :4], p)


def rxso3_matrix(g):
    return g[..., 4:5, None] * quat_to_matrix(g[..., :4])


# --------------------------------------------------------------------------
# Sim3
# --------------------------------------------------------------------------

def sim3_identity(shape=(), dtype=jnp.float32):
    data = jnp.zeros(tuple(shape) + (8,), dtype)
    return data.at[..., 6].set(1.0).at[..., 7].set(1.0)


def _sim3_W(phi, sigma):
    """The Sim(3) 'W' matrix with  t = W(phi, sigma) tau  in exp (Strasdat)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    sig = sigma[..., None]
    s = jnp.exp(sig)
    small_t = theta_sq < _EPS
    small_s = jnp.abs(sig) < _EPS

    # C = (s - 1)/sigma
    C = jnp.where(small_s, 1.0 + sig / 2.0 + sig * sig / 6.0, (s - 1.0) / jnp.where(small_s, 1.0, sig))

    denom = sig * sig + theta_sq
    denom = jnp.where(denom < 1e-24, 1.0, denom)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

    # General case coefficients (sigma != 0, theta != 0):
    #   A = (s sin + ... ) see Strasdat's Sophus sim3 implementation.
    a_gen = (s * sin_t * sig + (1.0 - s * cos_t) * theta) / (denom * jnp.where(small_t, 1.0, theta))
    b_gen = (C - ((s * cos_t - 1.0) * sig + s * sin_t * theta) / denom) / jnp.maximum(theta_sq, 1e-24)
    # sigma == 0 limits:
    a_sig0 = jnp.where(small_t, 0.5 - theta_sq / 24.0, (1.0 - cos_t) / jnp.maximum(theta_sq, 1e-24))
    b_sig0 = jnp.where(small_t, 1.0 / 6.0 - theta_sq / 120.0,
                       (theta - sin_t) / jnp.maximum(theta_sq * theta, 1e-24))
    # theta == 0, sigma != 0 limits. The small_s guards are never the
    # selected output (the outer where picks a_sig0/b_sig0 there) but must
    # still be the CORRECT series so a future where-chain refactor cannot
    # silently go wrong: ((sig-1)e^s+1)/sig^2 = 1/2 + sig/3 + O(sig^2),
    # (e^s(sig^2/2-sig+1)-1)/sig^3 = 1/6 + sig/8 + O(sig^2).
    sig_safe = jnp.where(small_s, 1.0, sig)
    a_th0 = jnp.where(small_s, 0.5 + sig / 3.0, ((sig - 1.0) * s + 1.0) / (sig_safe * sig_safe))
    b_th0 = jnp.where(small_s, 1.0 / 6.0 + sig / 8.0,
                      (s * (0.5 * sig * sig - sig + 1.0) - 1.0) / (sig_safe ** 3))

    A = jnp.where(small_s, a_sig0, jnp.where(small_t, a_th0, a_gen))
    B = jnp.where(small_s, b_sig0, jnp.where(small_t, b_th0, b_gen))

    P = hat(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), P.shape)
    return A * P + B * mm(P, P) + C * eye


def sim3_exp(xi):
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, tau, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def sim3_log(g):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def sim3_inv(g):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    qinv = quat_conj(q)
    return jnp.concatenate([-quat_rotate(qinv, t) / s, qinv, 1.0 / s], axis=-1)


def sim3_mul(g1, g2):
    t1, q1, s1 = g1[..., :3], g1[..., 3:7], g1[..., 7:8]
    t2, q2, s2 = g2[..., :3], g2[..., 3:7], g2[..., 7:8]
    q = quat_normalize(quat_mul(q1, q2))
    t = t1 + s1 * quat_rotate(q1, t2)
    return jnp.concatenate([t, q, s1 * s2], axis=-1)


def sim3_act(g, p):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    return s * quat_rotate(q, p) + t


def sim3_act4(g, p):
    v, w = p[..., :3], p[..., 3:4]
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    xyz = s * quat_rotate(q, v) + w * t
    return jnp.concatenate([xyz, jnp.broadcast_to(w, xyz.shape[:-1] + (1,))], axis=-1)


def sim3_matrix(g):
    t, q, s = g[..., :3], g[..., 3:7], g[..., 7:8]
    R = s[..., None] * quat_to_matrix(q)
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bot = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


@jax.tree_util.register_pytree_node_class
class Sim3:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        return cls(sim3_identity(shape, dtype))

    @classmethod
    def exp(cls, xi):
        return cls(sim3_exp(xi))

    def log(self):
        return sim3_log(self.data)

    def inv(self):
        return Sim3(sim3_inv(self.data))

    def __mul__(self, other):
        if isinstance(other, Sim3):
            return Sim3(sim3_mul(self.data, other.data))
        return self.act(other)

    def act(self, p):
        if p.shape[-1] == 4:
            return sim3_act4(self.data, p)
        return sim3_act(self.data, p)

    def retr(self, xi):
        return Sim3(sim3_mul(sim3_exp(xi), self.data))

    def matrix(self):
        return sim3_matrix(self.data)

    def vec(self):
        return self.data


@jax.tree_util.register_pytree_node_class
class RxSO3:
    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    def tree_flatten(self):
        return (self.data,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    @classmethod
    def Identity(cls, *shape, dtype=jnp.float32):
        return cls(rxso3_identity(shape, dtype))

    @classmethod
    def exp(cls, xi):
        return cls(rxso3_exp(xi))

    def log(self):
        return rxso3_log(self.data)

    def inv(self):
        return RxSO3(rxso3_inv(self.data))

    def __mul__(self, other):
        if isinstance(other, RxSO3):
            return RxSO3(rxso3_mul(self.data, other.data))
        return rxso3_act(self.data, other)

    def act(self, p):
        return rxso3_act(self.data, p)

    def matrix(self):
        return rxso3_matrix(self.data)

    def vec(self):
        return self.data
