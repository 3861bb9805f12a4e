"""Property tests for the Lie group layer.

Mirrors the reference's lietorch test laws (main/backend/lietorch/run_tests.py:
16-52: exp/log inverse, inverse law, adjoint identity, action-vs-matrix) and
adds finite-difference Jacobian checks in place of the vendored gradcheck.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from batrack_tpu.geometry import se3, sim3, so3
from batrack_tpu.geometry import quaternion as quat


def random_se3(rng, shape=(), scale=1.0):
    xi = rng.normal(size=shape + (6,)) * scale
    return se3.exp(jnp.asarray(xi, jnp.float32))


def random_so3(rng, shape=(), scale=1.0):
    phi = rng.normal(size=shape + (3,)) * scale
    return so3.exp(jnp.asarray(phi, jnp.float32))


class TestSO3:
    def test_exp_log_inverse(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        np.testing.assert_allclose(so3.log(so3.exp(phi)), phi, atol=1e-5)

    def test_exp_log_small_angle(self, rng):
        phi = jnp.asarray(rng.normal(size=(64, 3)) * 1e-5, jnp.float32)
        np.testing.assert_allclose(so3.log(so3.exp(phi)), phi, atol=1e-9)

    def test_inv(self, rng):
        q = random_so3(rng, (32,))
        out = so3.mul(q, so3.inv(q))
        np.testing.assert_allclose(out, so3.identity((32,)), atol=1e-6)

    def test_adjoint_identity(self, rng):
        # X * Exp(a) == Exp(Adj_X a) * X
        q = random_so3(rng, (16,))
        a = jnp.asarray(rng.normal(size=(16, 3)) * 0.5, jnp.float32)
        lhs = so3.mul(q, so3.exp(a))
        rhs = so3.mul(so3.exp(so3.adj(q, a)), q)
        np.testing.assert_allclose(
            so3.act(lhs, jnp.ones(3)), so3.act(rhs, jnp.ones(3)), atol=1e-5
        )

    def test_act_matches_matrix(self, rng):
        q = random_so3(rng, (16,))
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        np.testing.assert_allclose(
            so3.act(q, p), jnp.einsum("nij,nj->ni", so3.matrix(q), p), atol=1e-5
        )

    def test_matrix_roundtrip(self, rng):
        q = random_so3(rng, (32,))
        q2 = so3.from_matrix(so3.matrix(q))
        # quaternions are unique up to sign
        sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q, sign * q2, atol=1e-5)


class TestSE3:
    def test_exp_log_inverse(self, rng):
        # log o exp == id only on |phi| < pi: log is the atan-based SHORT
        # rotation (so3.h:115-151), so clamp the rotation part's norm
        xi = rng.normal(size=(64, 6)).astype(np.float32)
        nrm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 3.0 / np.maximum(nrm, 1e-9))
        xi = jnp.asarray(xi)
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-4)

    def test_exp_log_small(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 6)) * 1e-5, jnp.float32)
        np.testing.assert_allclose(se3.log(se3.exp(xi)), xi, atol=1e-9)

    def test_inv(self, rng):
        g = random_se3(rng, (32,))
        out = se3.mul(g, se3.inv(g))
        np.testing.assert_allclose(out, se3.identity((32,)), atol=1e-5)

    def test_associativity(self, rng):
        a, b, c = (random_se3(rng, (8,)) for _ in range(3))
        np.testing.assert_allclose(
            se3.mul(se3.mul(a, b), c), se3.mul(a, se3.mul(b, c)), atol=1e-5
        )

    def test_adjoint_identity(self, rng):
        # X * Exp(a) == Exp(Adj_X a) * X  (run_tests.py adjoint law)
        g = random_se3(rng, (16,))
        a = jnp.asarray(rng.normal(size=(16, 6)) * 0.3, jnp.float32)
        lhs = se3.mul(g, se3.exp(a))
        rhs = se3.mul(se3.exp(se3.adj(g, a)), g)
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        np.testing.assert_allclose(se3.act(lhs, p), se3.act(rhs, p), atol=2e-4)

    def test_adjT_is_transpose_of_adj(self, rng):
        g = random_se3(rng, (16,))
        a = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
        # <Adj a, b> == <a, AdjT b>
        lhs = jnp.sum(se3.adj(g, a) * b, axis=-1)
        rhs = jnp.sum(a * se3.adjT(g, b), axis=-1)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)

    def test_adjoint_matrix_consistent(self, rng):
        g = random_se3(rng, (8,))
        a = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        np.testing.assert_allclose(
            se3.adj(g, a),
            jnp.einsum("nij,nj->ni", se3.adjoint_matrix(g), a),
            atol=1e-5,
        )

    def test_act_matches_matrix(self, rng):
        g = random_se3(rng, (16,))
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        hom = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        out = jnp.einsum("nij,nj->ni", se3.matrix(g), hom)
        np.testing.assert_allclose(se3.act(g, p), out[..., :3], atol=1e-5)

    def test_act4(self, rng):
        g = random_se3(rng, (16,))
        p4 = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
        out = jnp.einsum("nij,nj->ni", se3.matrix(g), p4)
        np.testing.assert_allclose(se3.act4(g, p4), out, atol=1e-5)

    def test_matrix_roundtrip(self, rng):
        g = random_se3(rng, (32,))
        g2 = se3.from_matrix(se3.matrix(g))
        sign = jnp.sign(jnp.sum(g[..., 3:] * g2[..., 3:], axis=-1, keepdims=True))
        np.testing.assert_allclose(g[..., :3], g2[..., :3], atol=1e-5)
        np.testing.assert_allclose(g[..., 3:], sign * g2[..., 3:], atol=1e-5)

    def test_retr_is_left_multiplication(self, rng):
        g = random_se3(rng, (8,))
        xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.1, jnp.float32)
        np.testing.assert_allclose(
            se3.retr(g, xi), se3.mul(se3.exp(xi), g), atol=1e-6
        )

    def test_left_jacobian_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)) * 0.7, jnp.float32)
        J = se3.left_jacobian(xi)
        Jinv = se3.left_jacobian_inverse(xi)
        eye = jnp.broadcast_to(jnp.eye(6), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)

    def test_left_jacobian_vs_autodiff(self, rng):
        # d/deps log(Exp(xi + eps)) = Jl^{-1}(xi) ... equivalently
        # d/deps [Exp(eps_vec) Exp(xi)] log = ... use: Exp(Jl(xi) eps) Exp(xi)
        # ~= Exp(xi + eps). Check via finite differences.
        xi = jnp.asarray(rng.normal(size=(6,)) * 0.5, jnp.float32)
        J = se3.left_jacobian(xi)
        eps = 1e-3
        for k in range(6):
            dxi = jnp.zeros(6).at[k].set(eps)
            lhs = se3.exp(xi + dxi)
            rhs = se3.mul(se3.exp(J @ dxi), se3.exp(xi))
            np.testing.assert_allclose(lhs, rhs, atol=5e-5)

    def test_jit_and_vmap(self, rng):
        g = random_se3(rng, (4, 5))
        f = jax.jit(lambda a, b: se3.mul(a, se3.inv(b)))
        out = f(g, g)
        np.testing.assert_allclose(out, se3.identity((4, 5)), atol=1e-5)


class TestSim3:
    def test_exp_log_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 7)) * 0.5, jnp.float32)
        np.testing.assert_allclose(sim3.sim3_log(sim3.sim3_exp(xi)), xi, atol=1e-3)

    def test_inv(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
        g = sim3.sim3_exp(xi)
        out = sim3.sim3_mul(g, sim3.sim3_inv(g))
        np.testing.assert_allclose(out, sim3.sim3_identity((16,)), atol=1e-5)

    def test_act_matches_matrix(self, rng):
        xi = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
        g = sim3.sim3_exp(xi)
        p = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        hom = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        out = jnp.einsum("nij,nj->ni", sim3.sim3_matrix(g), hom)
        np.testing.assert_allclose(sim3.sim3_act(g, p), out[..., :3], atol=1e-4)

    def test_se3_embedding(self, rng):
        # Sim3 with s=1 behaves like SE3
        g = random_se3(rng, (8,))
        gs = jnp.concatenate([g, jnp.ones_like(g[..., :1])], axis=-1)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        np.testing.assert_allclose(sim3.sim3_act(gs, p), se3.act(g, p), atol=1e-5)


class TestQuaternion:
    def test_rotate_matches_matrix(self, rng):
        q = random_so3(rng, (32,))
        v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
        np.testing.assert_allclose(
            quat.quat_rotate(q, v),
            jnp.einsum("nij,nj->ni", quat.quat_to_matrix(q), v),
            atol=1e-5,
        )

    def test_mul_matches_matrix_product(self, rng):
        q1, q2 = random_so3(rng, (16,)), random_so3(rng, (16,))
        np.testing.assert_allclose(
            quat.quat_to_matrix(quat.quat_mul(q1, q2)),
            quat.quat_to_matrix(q1) @ quat.quat_to_matrix(q2),
            atol=1e-5,
        )


def test_so3_log_hemisphere_invariant(rng):
    """log(q) == log(-q) (atan-based convention, so3.h:115-151): the
    returned rotation is always the short one, with no ~2pi blowup for
    w < 0 quaternions near the identity."""
    import jax.numpy as jnp

    from batrack_tpu.geometry.quaternion import so3_log

    qs = rng.normal(size=(200, 4)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    a = np.asarray(so3_log(jnp.asarray(qs)))
    b = np.asarray(so3_log(jnp.asarray(-qs)))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # the old atan2 blowup case: tiny rotation stored with w ~ -1
    q = jnp.asarray([2e-3, 0.0, 0.0, -np.sqrt(1.0 - 4e-6)], jnp.float32)
    assert float(jnp.linalg.norm(so3_log(q))) < 0.01


def test_se3_left_jacobian_finite_difference(rng):
    """Barfoot Q block: exp(xi + d) ~ exp(Jl d) exp(xi) to FD accuracy
    (the Q sign bug was invisible to Jl @ Jl_inv == I, where Q cancels)."""
    import jax
    import jax.numpy as jnp

    from batrack_tpu.geometry import se3

    with jax.enable_x64(True):
        for scale in (0.3, 1.5):
            xi = jnp.asarray(rng.normal(size=6) * scale, jnp.float64)
            Jl = np.asarray(se3.left_jacobian(xi))
            eps = 1e-7
            fd = np.zeros((6, 6))
            for i in range(6):
                d = np.zeros(6)
                d[i] = eps
                delta = se3.log(
                    se3.mul(se3.exp(xi + jnp.asarray(d)),
                            se3.inv(se3.exp(xi)))
                )
                fd[:, i] = np.asarray(delta) / eps
            np.testing.assert_allclose(Jl, fd, atol=1e-5)
