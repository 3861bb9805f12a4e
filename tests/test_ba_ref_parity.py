"""BA-solver parity against the *actual* reference solver.

Imports /root/reference/main/backend/ba.py (torch CPU) with two pure-torch
dependency stubs — torch_scatter.scatter_sum (index_add_) and a quaternion
SE3 drop-in for the compiled lietorch extension (conventions transcribed
from lietorch/include/se3.h: data [tx ty tz qx qy qz qw], tangent
[trans(3), rot(3)], retr = Exp(a)·X, Adj = [[R, t^ R], [0, R]]) — builds
identical factor-graph snapshots, and asserts our ba_iteration (flat) and
slot-chain reproduce BA_rgbd_droid's pose/depth updates (ba.py:217-339) in
f64 to 1e-9.

The edge set deliberately includes patches whose every edge is gated
(flow > 250 px / behind-camera): the reference still lists them in
torch.unique(kk) and pulls their disparity toward the mono prior, a
semantic our solver must reproduce.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# pure-torch lietorch SE3 drop-in (f64-capable, CPU)
# ---------------------------------------------------------------------------


def _qmul(q1, q2):
    x1, y1, z1, w1 = q1.unbind(-1)
    x2, y2, z2, w2 = q2.unbind(-1)
    return torch.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        dim=-1,
    )


def _qrot(q, v):
    """Rotate (..., 3) v by unit quaternion (..., 4) q = [x, y, z, w]."""
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * torch.cross(qv, v, dim=-1)
    return v + w * t + torch.cross(qv, t, dim=-1)


def _qinv(q):
    return q * torch.tensor([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


class _SE3:
    """Quaternion SE3 with the exact lietorch surface ba.py/pops use."""

    def __init__(self, data):
        self.data = data  # (..., 7) [t(3), q(4)]

    @property
    def shape(self):
        return self.data.shape[:-1]

    @property
    def device(self):
        return self.data.device

    def __getitem__(self, idx):
        return _SE3(self.data[idx])

    def __setitem__(self, idx, value):
        # pops.transform(tonly=True) zeroes the rotation by writing into the
        # group's raw data (projective_ops.py:63-64)
        self.data[idx] = value

    def inv(self):
        t, q = self.data[..., :3], self.data[..., 3:]
        qi = _qinv(q)
        return _SE3(torch.cat([-_qrot(qi, t), qi], dim=-1))

    def __mul__(self, other):
        if isinstance(other, _SE3):
            t1, q1 = self.data[..., :3], self.data[..., 3:]
            t2, q2 = other.data[..., :3], other.data[..., 3:]
            t1, t2 = torch.broadcast_tensors(t1, t2)
            q1, q2 = torch.broadcast_tensors(q1, q2)
            return _SE3(torch.cat([t1 + _qrot(q1, t2), _qmul(q1, q2)], dim=-1))
        # action on points (act3 / act4, se3.h:50-56)
        p = other
        t, q = self.data[..., :3], self.data[..., 3:]
        if p.shape[-1] == 3:
            t, _ = torch.broadcast_tensors(t, p)
            return _qrot(q, p) + t
        p3, w = p[..., :3], p[..., 3:]
        t, p3 = torch.broadcast_tensors(t, p3)
        q = torch.broadcast_tensors(q, torch.empty(p3.shape[:-1] + (4,), dtype=q.dtype))[0]
        return torch.cat([_qrot(q, p3) + t * w, w], dim=-1)

    def adjT(self, a):
        """b = Adj(X)^T a: b_v = R^T a_v, b_w = R^T (a_w - t x a_v)."""
        t, q = self.data[..., :3], self.data[..., 3:]
        av, aw = a[..., :3], a[..., 3:]
        t, av = torch.broadcast_tensors(t, av)
        qi = _qinv(torch.broadcast_tensors(q, torch.empty(av.shape[:-1] + (4,), dtype=q.dtype))[0])
        bv = _qrot(qi, av)
        bw = _qrot(qi, aw - torch.cross(t, av, dim=-1))
        return torch.cat([bv, bw], dim=-1)

    def vec(self):
        return self.data

    def log(self):
        """[Vinv(phi) t, phi] (se3.h:126-133)."""
        t, q = self.data[..., :3], self.data[..., 3:]
        qv, w = q[..., :3], q[..., 3:4]
        n = torch.linalg.norm(qv, dim=-1, keepdim=True)
        theta = 2.0 * torch.atan2(n, torch.abs(w))
        sign = torch.where(w < 0, -torch.ones_like(w), torch.ones_like(w))
        scale = torch.where(n < 1e-9, 2.0 * sign / torch.clamp(torch.abs(w), min=1e-12),
                            sign * theta / torch.clamp(n, min=1e-12))
        phi = scale * qv
        theta2 = (phi * phi).sum(-1, keepdim=True)
        th = torch.sqrt(torch.clamp(theta2, min=1e-32))
        small = theta2 < 1e-16
        # Vinv = I - 0.5 Phi + c Phi^2, c = (1 - th*cos(th/2)/(2 sin(th/2)))/th^2
        half = 0.5 * th
        c = torch.where(
            small, 1.0 / 12.0 + theta2 / 720.0,
            (1.0 - half * torch.cos(half) / torch.clamp(torch.sin(half), min=1e-12)) / theta2,
        )
        pxt = torch.cross(phi, t, dim=-1)
        tau = t - 0.5 * pxt + c * torch.cross(phi, pxt, dim=-1)
        return torch.cat([tau, phi], dim=-1)

    def matrix(self):
        t, q = self.data[..., :3], self.data[..., 3:]
        x, y, z, w = q.unbind(-1)
        R = torch.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            dim=-1,
        ).view(q.shape[:-1] + (3, 3))
        M = torch.zeros(q.shape[:-1] + (4, 4), dtype=q.dtype)
        M[..., :3, :3] = R
        M[..., :3, 3] = t
        M[..., 3, 3] = 1.0
        return M

    @staticmethod
    def exp(tau_phi):
        tau, phi = tau_phi[..., :3], tau_phi[..., 3:]
        theta2 = (phi * phi).sum(-1, keepdim=True)
        theta = torch.sqrt(torch.clamp(theta2, min=1e-32))
        small = theta2 < 1e-16
        # quaternion
        half = 0.5 * theta
        sinc_half = torch.where(small, 0.5 - theta2 / 48.0, torch.sin(half) / theta)
        q = torch.cat([sinc_half * phi, torch.cos(half)], dim=-1)
        # V(phi) tau (left Jacobian of SO3)
        a = torch.where(small, 0.5 - theta2 / 24.0, (1 - torch.cos(theta)) / theta2)
        b = torch.where(
            small, 1.0 / 6.0 - theta2 / 120.0, (theta - torch.sin(theta)) / (theta2 * theta)
        )
        pxt = torch.cross(phi, tau, dim=-1)
        t = tau + a * pxt + b * torch.cross(phi, pxt, dim=-1)
        return _SE3(torch.cat([t, q], dim=-1))

    def retr(self, a):
        return _SE3.exp(a) * self


def _scatter_sum(src, index, dim=0, dim_size=None):
    if dim < 0:
        dim += src.dim()
    shape = list(src.shape)
    shape[dim] = dim_size if dim_size is not None else int(index.max()) + 1
    out = src.new_zeros(shape)
    return out.index_add(dim, index, src)


def _import_reference_ba():
    """Import the reference solver with the stubs installed."""
    if "backend.ba" in sys.modules:
        return sys.modules["backend.ba"]
    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = _scatter_sum
    sys.modules["torch_scatter"] = ts
    lt = types.ModuleType("backend.lietorch")
    lt.SE3 = _SE3
    lt.Sim3 = _SE3  # imported by projective_ops, unused in the BA path
    sys.modules["backend.lietorch"] = lt
    if "/root/reference/main" not in sys.path:
        sys.path.insert(0, "/root/reference/main")
    import backend.ba as ref_ba  # noqa: E402

    return ref_ba


# ---------------------------------------------------------------------------
# shim self-check: the torch SE3 must match our JAX group exactly
# ---------------------------------------------------------------------------


def test_torch_se3_shim_matches_jax_group(rng):
    from batrack_tpu.geometry import se3

    with jax.enable_x64(True):
        xi = rng.normal(size=(5, 6)) * 0.5
        g_j = np.asarray(se3.exp(jnp.asarray(xi, jnp.float64)))
        g_t = _SE3.exp(torch.tensor(xi, dtype=torch.float64)).data.numpy()
        np.testing.assert_allclose(g_t, g_j, atol=1e-12)

        a = _SE3(torch.tensor(g_j))
        b = _SE3(torch.tensor(np.roll(g_j, 1, axis=0)))
        m_j = np.asarray(se3.mul(jnp.asarray(g_j), jnp.asarray(np.roll(g_j, 1, axis=0))))
        np.testing.assert_allclose((a * b).data.numpy(), m_j, atol=1e-12)
        np.testing.assert_allclose(
            a.inv().data.numpy(), np.asarray(se3.inv(jnp.asarray(g_j))), atol=1e-12
        )
        tang = rng.normal(size=(5, 6))
        np.testing.assert_allclose(
            a.adjT(torch.tensor(tang)).numpy(),
            np.asarray(se3.adjT(jnp.asarray(g_j), jnp.asarray(tang))),
            atol=1e-12,
        )
        p4 = rng.normal(size=(5, 4))
        np.testing.assert_allclose(
            (a * torch.tensor(p4)).numpy(),
            np.asarray(se3.act4(jnp.asarray(g_j), jnp.asarray(p4))),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            a.matrix().numpy(), np.asarray(se3.matrix(jnp.asarray(g_j))), atol=1e-12
        )
        np.testing.assert_allclose(
            a.log().numpy(), np.asarray(se3.log(jnp.asarray(g_j))), atol=1e-10
        )


# ---------------------------------------------------------------------------
# factor-graph snapshot shared by both solvers
# ---------------------------------------------------------------------------

N, M = 12, 6
HT, WD = 480, 640
FIXEDP = 2


def _make_problem(rng):
    from batrack_tpu.geometry import se3

    ts = np.arange(N, dtype=np.float64)
    xi = np.stack(
        [0.08 * ts, 0.03 * np.sin(ts * 0.4), 0.02 * ts,
         0.01 * np.sin(ts * 0.3), 0.012 * np.cos(ts * 0.2) - 0.012, 0.004 * ts], -1)
    poses = np.asarray(se3.exp(jnp.asarray(xi, jnp.float64)))
    intr = np.tile(np.array([400.0, 400.0, WD / 2, HT / 2]), (N, 1))

    patches = np.stack(
        [rng.uniform(40, WD - 40, N * M), rng.uniform(40, HT - 40, N * M),
         rng.uniform(0.3, 1.5, N * M)], -1)
    monodisp = patches[:, 2] + rng.normal(size=N * M) * 0.02
    monodisp[:: 7] = 1e-3  # exercise the sensor-validity gate (ba.py:301)

    ii, jj, kk = [], [], []
    for i in range(N):
        for j in range(max(0, i - 2), min(N, i + 3)):
            for m in range(M):
                ii.append(i), jj.append(j), kk.append(i * M + m)
    ii, jj, kk = (np.asarray(a, np.int64) for a in (ii, jj, kk))

    from batrack_tpu.geometry import projective

    coords, _, _ = projective.transform(
        jnp.asarray(poses), jnp.asarray(patches), jnp.asarray(intr),
        jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk))
    targets = np.asarray(coords) + rng.normal(size=(len(ii), 2)) * 1.5
    # a handful of large-residual targets exercise the huber reweight + the
    # flow>250 gate; patch (N*M - 1) has EVERY edge gated -> the reference
    # still pulls it toward the mono prior via unique(kk)
    targets[::11] += 400.0
    targets[kk == N * M - 1] += 1000.0
    weights = rng.uniform(0.2, 1.0, size=(len(ii), 2))
    return poses, patches, monodisp, intr, targets, weights, ii, jj, kk


def _run_reference(ref_ba, prob, structure_only, loss, ep, lmbda, alpha):
    poses, patches, monodisp, intr, targets, weights, ii, jj, kk = prob
    t64 = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
    poses_t = _SE3(t64(poses)[None])
    patches_t = t64(patches).view(1, N * M, 3, 1, 1)
    out = ref_ba.BA_rgbd_droid(
        poses_t, patches_t, t64(monodisp)[None, :, None], t64(intr)[None],
        t64(targets)[None], None, t64(weights)[None], lmbda,
        torch.tensor(ii), torch.tensor(jj), torch.tensor(kk),
        bounds=[0.0, 0.0, WD, HT], ep=ep, fixedp=FIXEDP,
        structure_only=structure_only, loss=loss, alpha=alpha,
    )
    poses_out, patches_out = out
    return poses_out.data[0].numpy(), patches_out[0, :, 2, 0, 0].numpy()


def _run_ours(prob, structure_only, loss, ep, lmbda, alpha):
    from batrack_tpu.ba import BAProblem, ba_iteration

    poses, patches, monodisp, intr, targets, weights, ii, jj, kk = prob
    j64 = lambda a: jnp.asarray(a, jnp.float64)
    bap = BAProblem(
        poses=j64(poses), patches=j64(patches), monodisp=j64(monodisp),
        intrinsics=j64(intr), targets=j64(targets), weights=j64(weights),
        ii=jnp.asarray(ii, jnp.int32), jj=jnp.asarray(jj, jnp.int32),
        kk=jnp.asarray(kk, jnp.int32),
        valid=jnp.ones(len(ii), jnp.float64),
        t0=jnp.asarray(FIXEDP, jnp.int32), n=jnp.asarray(N, jnp.int32),
        base_k=jnp.asarray(0, jnp.int32),
    )
    poses_out, patches_out = ba_iteration(
        bap, window=N - FIXEDP, patch_window=N, patches_per_frame=M,
        bounds=(0.0, 0.0, float(WD), float(HT)), ep=ep, lmbda=lmbda,
        alpha=alpha, loss=loss, structure_only=structure_only,
    )
    return np.asarray(poses_out), np.asarray(patches_out[:, 2])


@pytest.mark.parametrize(
    "structure_only,loss",
    [(False, "huber"), (True, "huber"), (False, "cauchy"), (False, "trivial")],
)
def test_ba_step_matches_reference(rng, structure_only, loss):
    ref_ba = _import_reference_ba()
    ep, lmbda, alpha = 10.0, 1e-4, 0.05
    with jax.enable_x64(True):
        prob = _make_problem(rng)
        p_ref, d_ref = _run_reference(ref_ba, prob, structure_only, loss, ep, lmbda, alpha)
        p_our, d_our = _run_ours(prob, structure_only, loss, ep, lmbda, alpha)
    np.testing.assert_allclose(p_our, p_ref, atol=1e-9)
    np.testing.assert_allclose(d_our, d_ref, atol=1e-9)


def test_ba_multi_iteration_trajectory_matches_reference(rng):
    """4x dual BA (pose pass + structure pass, batrack.py:869-875) end to
    end: the composed linearize->solve->retract chain stays equal."""
    ref_ba = _import_reference_ba()
    ep, lmbda, alpha = 10.0, 1e-4, 0.05
    with jax.enable_x64(True):
        prob = _make_problem(rng)
        poses, patches, monodisp, intr, targets, weights, ii, jj, kk = prob
        wp = weights * (rng.uniform(size=(len(ii), 1)) > 0.3)  # "static" mask

        p_ref, d_ref = poses, patches[:, 2]
        p_our, d_our = poses, patches[:, 2]
        for _ in range(4):
            for so, w in ((False, wp), (True, weights)):
                prob_r = (p_ref, np.concatenate(
                    [patches[:, :2], d_ref[:, None]], 1), monodisp, intr,
                    targets, w, ii, jj, kk)
                p_ref, d_ref = _run_reference(ref_ba, prob_r, so, "huber", ep, lmbda, alpha)
                prob_o = (p_our, np.concatenate(
                    [patches[:, :2], d_our[:, None]], 1), monodisp, intr,
                    targets, w, ii, jj, kk)
                p_our, d_our = _run_ours(prob_o, so, "huber", ep, lmbda, alpha)
        np.testing.assert_allclose(p_our, p_ref, atol=1e-8)
        np.testing.assert_allclose(d_our, d_ref, atol=1e-8)
