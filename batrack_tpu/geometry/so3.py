"""SO(3) group on quaternion vectors (..., 4) = [qx, qy, qz, qw].

Mirrors the reference lietorch SO3 API (main/backend/lietorch/groups.py:168-208)
as pure-JAX functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from batrack_tpu.geometry.quaternion import (
    matrix_to_quat,
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_matrix,
    so3_exp,
    so3_log,
)


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    data = jnp.zeros(tuple(shape) + (4,), dtype)
    return data.at[..., 3].set(1.0)


exp = so3_exp
log = so3_log
inv = quat_conj


def mul(q1, q2):
    return quat_normalize(quat_mul(q1, q2))


act = quat_rotate
matrix = quat_to_matrix
from_matrix = matrix_to_quat


def adj(q, a):
    return quat_rotate(q, a)


def adjT(q, a):
    return quat_rotate(quat_conj(q), a)


def retr(q, phi):
    return mul(so3_exp(phi), q)


@jax.tree_util.register_pytree_node_class
class SO3:
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
        return cls(identity(shape, dtype))

    @classmethod
    def exp(cls, phi):
        return cls(exp(phi))

    def log(self):
        return log(self.data)

    def inv(self):
        return SO3(inv(self.data))

    def __mul__(self, other):
        if isinstance(other, SO3):
            return SO3(mul(self.data, other.data))
        return act(self.data, other)

    def act(self, p):
        return act(self.data, p)

    def retr(self, phi):
        return SO3(retr(self.data, phi))

    def adj(self, a):
        return adj(self.data, a)

    def adjT(self, a):
        return adjT(self.data, a)

    def matrix(self):
        return matrix(self.data)

    def vec(self):
        return self.data
