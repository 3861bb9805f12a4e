"""Stage-3 refine parity against the *actual* reference RefineNet.

Imports /root/reference/main/global_refine/model/refine_net.py (torch CPU)
with a pure-torch pypose stub (an SE3 LieTensor drop-in built on the same
quaternion conventions as the BA suite's lietorch shim — pypose and
lietorch share the [tx ty tz qx qy qz qw] layout), feeds both stacks the
same synthetic results.pkl, and asserts:

  * data prep parity: aligned depth maps + mono disparity sampled along
    tracks (refine_net.py:53-118) to 1e-12,
  * per-loss parity in f64: spatial (refine_net.py:252-268), inter_frame
    (:197-222), inter_frame_local (:224-250), cam_smooth (:356-360),
    scale_grid_smoothness l1 (:362-392) at 1e-9; pts_3d (:314-354) at a
    f32-limited tolerance (the reference casts intermediates with
    .float() at :322,342),
  * a matched Adam trajectory (trainer.py:23-59, fixed_pose + fixed_K so
    both sides optimize the same Euclidean parameters with the same
    cosine-scheduled Adam(betas=(0.9, 0.9))).

Track coordinates are quantized to 1/8 so the reference's internal f32
coordinate casts (model/utils.py:16-17) are lossless and f64 comparisons
stay meaningful.
"""

import pickle
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_ba_ref_parity import _qinv, _qmul, _qrot

REF_ROOT = "/root/reference/main/global_refine"


# ---------------------------------------------------------------------------
# pypose stub: an SE3 LieTensor drop-in (torch.Tensor subclass, so
# torch.stack / indexing / arithmetic keep working as refine_net.py expects)
# ---------------------------------------------------------------------------


def _act3(g, p):
    """SE3 (..., 7) acting on points (..., 3), broadcasting + promoting
    (the reference feeds f32 points — iproj(...).float() — to f64 poses;
    torch arithmetic would promote, torch.cross inside _qrot does not)."""
    dt = torch.promote_types(g.dtype, p.dtype)
    t, q = g[..., :3].to(dt), g[..., 3:].to(dt)
    p = p.to(dt)
    shape = torch.broadcast_shapes(t.shape, p.shape)
    t = t.expand(shape)
    p = p.expand(shape)
    q = q.expand(shape[:-1] + (4,))
    return _qrot(q, p) + t


class _LieSE3(torch.Tensor):
    """Minimal pypose.SE3 LieTensor: Inv / @ / tensor / matrix."""

    @staticmethod
    def __new__(cls, data, requires_grad=False):
        data = torch.as_tensor(data)
        return torch.Tensor._make_subclass(cls, data, requires_grad)

    def tensor(self):
        return self.as_subclass(torch.Tensor)

    def Inv(self):
        d = self.tensor()
        t, q = d[..., :3], d[..., 3:]
        qi = _qinv(q)
        return _LieSE3(torch.cat([-_qrot(qi, t), qi], dim=-1))

    def __matmul__(self, other):
        a = self.tensor()
        if isinstance(other, _LieSE3) or (
            torch.is_tensor(other) and other.shape[-1] == 7
        ):
            b = other.as_subclass(torch.Tensor) if isinstance(
                other, _LieSE3) else other
            t1, q1 = a[..., :3], a[..., 3:]
            t2, q2 = b[..., :3], b[..., 3:]
            shape = torch.broadcast_shapes(t1.shape, t2.shape)
            t1, t2 = t1.expand(shape), t2.expand(shape)
            q1 = q1.expand(shape[:-1] + (4,))
            q2 = q2.expand(shape[:-1] + (4,))
            return _LieSE3(
                torch.cat([t1 + _qrot(q1, t2), _qmul(q1, q2)], dim=-1)
            )
        return _act3(a, other.as_subclass(torch.Tensor)
                     if isinstance(other, _LieSE3) else other)

    def matrix(self):
        d = self.tensor()
        t, q = d[..., :3], d[..., 3:]
        x, y, z, w = q.unbind(-1)
        R = torch.stack(
            [
                1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
            ],
            dim=-1,
        ).view(q.shape[:-1] + (3, 3))
        M = torch.zeros(q.shape[:-1] + (4, 4), dtype=d.dtype)
        M[..., :3, :3] = R
        M[..., :3, 3] = t
        M[..., 3, 3] = 1.0
        return M


def _mat2se3(m):
    """(…, 4, 4) -> SE3 7-vector. Shepperd branch-w (rotations in the tests
    are small, so tr > 0 and this is the numerically-best branch — the same
    one our geometry.quaternion.matrix_to_quat selects)."""
    m = torch.as_tensor(m)
    R = m[..., :3, :3]
    t = m[..., :3, 3]
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    s = 2.0 * torch.sqrt(torch.clamp(1.0 + tr, min=1e-12))
    q = torch.stack(
        [
            (R[..., 2, 1] - R[..., 1, 2]) / s,
            (R[..., 0, 2] - R[..., 2, 0]) / s,
            (R[..., 1, 0] - R[..., 0, 1]) / s,
            0.25 * s,
        ],
        dim=-1,
    )
    q = q / torch.linalg.norm(q, dim=-1, keepdim=True)
    return _LieSE3(torch.cat([t, q], dim=-1))


def _install_pypose_stub():
    import types

    pp = types.ModuleType("pypose")
    pp.mat2SE3 = _mat2se3
    pp.SE3 = lambda x: x if isinstance(x, _LieSE3) else _LieSE3(x)
    pp.Parameter = lambda x: x if isinstance(x, _LieSE3) else _LieSE3(x)
    sys.modules["pypose"] = pp


def _import_reference_refine():
    """Import the reference RefineNet/trainer with stubs + sys.path set."""
    _install_pypose_stub()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the reference's `model` package must not collide with anything a
    # previous test imported under that name
    mod = sys.modules.get("model")
    if mod is not None and REF_ROOT not in (mod.__path__[0] if hasattr(
            mod, "__path__") else ""):
        for k in [k for k in sys.modules if k == "model" or k.startswith("model.")]:
            del sys.modules[k]
    import model.refine_net as ref_refine  # noqa: E402
    import model.trainer as ref_trainer  # noqa: E402

    return ref_refine, ref_trainer


# ---------------------------------------------------------------------------
# shared synthetic results.pkl
# ---------------------------------------------------------------------------

T, N, S_LOCAL, H, W = 6, 8, 5, 48, 48
GRID = 4


def _make_results(rng):
    from batrack_tpu.geometry import se3

    # coords quantized to 1/8: exact through the reference's f32 casts
    xy = np.round(rng.uniform(1.0, W - 2.0, (T, N, S_LOCAL, 2)) * 8.0) / 8.0
    # a couple of points near the origin to flip the |xy| > 5 "flow" gate
    xy[0, 0, 0] = [1.0, 1.0]
    xy[2, 3, 2] = [0.5, 2.0]
    disp = rng.uniform(0.2, 2.0, (T, N, S_LOCAL))
    disp[1, 2, 1] = 5e-3  # below the 1e-2 disparity gate
    trajs = np.concatenate([xy, disp[..., None]], axis=-1)

    vis = (rng.uniform(0, 1, (T, N, S_LOCAL)) > 0.25).astype(np.float64) * 0.95
    static = (rng.uniform(0, 1, (T, N, S_LOCAL)) > 0.3).astype(np.float64)

    ts = np.arange(T, dtype=np.float64)
    xi = np.stack(
        [0.05 * ts, 0.02 * np.sin(ts), 0.01 * ts,
         0.02 * np.sin(ts * 0.7), 0.015 * np.cos(ts * 0.5) - 0.015,
         0.01 * ts], -1)
    with jax.enable_x64(True):
        cams = np.asarray(se3.matrix(se3.exp(jnp.asarray(xi, jnp.float64))))

    intr = np.tile(np.array([40.0, 40.5, 24.0, 23.5]), (T, 1))
    intr[:, 0] += 0.25 * np.arange(T)

    return {
        "trajs_2d_disp": trajs,
        "dmaps": rng.uniform(0.5, 3.0, (T, H, W, 1)),
        "cams_T_world": cams,
        "grid_query_frames": np.array([0, 2, 5], np.int64),
        "trajs_valid": np.ones((T, N), np.float64),
        "trajs_static": static,
        "trajs_vis": vis,
        "intrinsics": intr,
    }


@pytest.fixture(scope="module")
def stacks(tmp_path_factory):
    """(reference net, reference trainer module, our data, results dict)."""
    rng = np.random.default_rng(7)
    results = _make_results(rng)
    pkl = tmp_path_factory.mktemp("refine") / "results.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(results, f)

    ref_refine, ref_trainer = _import_reference_refine()

    def make_net(weights):
        net = ref_refine.RefineNet(
            device="cpu", result_path=str(pkl), grid_size=GRID,
            align_depth=True, loss_weight_dict=weights,
            refine_intrinsics=False, verbose=False,
        )
        return net.double()

    from batrack_tpu.refine.refine_net import build_refine_data

    with jax.enable_x64(True):
        data = build_refine_data(results, align_depth=True, dtype=np.float64)
    return make_net, ref_trainer, data, results


def _params64(data):
    from batrack_tpu.refine.refine_net import init_params

    return init_params(data, GRID, dtype=jnp.float64)


WEIGHTS_ALL = {
    "spatial_loss": 5.0,
    "inter_frame_loss": 0.3,
    "pts_3d_loss": 1.0,
    "cam_smooth_vec_loss": 1.0,
    "scale_smoothness_loss": 0.3,
}


def test_data_prep_parity(stacks):
    make_net, _, data, _ = stacks
    net = make_net(WEIGHTS_ALL)
    # aligned depth maps (model/utils.py:268-313)
    np.testing.assert_allclose(
        np.asarray(data.dmaps), net.dmaps[:, 0].numpy(), atol=1e-12
    )
    # mono disparity sampled along the 2D tracks (refine_net.py:95-108)
    np.testing.assert_allclose(
        np.asarray(data.trajs_disp_mono), net.trajs_disp_mono.numpy(),
        atol=1e-12,
    )
    # pose init: stub mat2SE3 vs our from_matrix convention
    np.testing.assert_allclose(
        np.asarray(data.pose_init), net.pose_init.tensor().numpy(), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(data.intrinsics), net.intrinsics.numpy(), atol=1e-12
    )


def test_loss_value_parity(stacks):
    from batrack_tpu.refine import refine_net as ours

    make_net, _, data, _ = stacks
    net = make_net(WEIGHTS_ALL)
    with jax.enable_x64(True):
        p = _params64(data)
        with torch.no_grad():
            # spatial: isolate via a weight dict holding only spatial=1
            net_sp = make_net({"spatial_loss": 1.0})
            ref_spatial = float(net_sp())
            ref_inter = float(net.inter_frame_loss())
            ref_inter_local = float(net.inter_frame_loss_local())
            ref_pts3d = float(net.pts_3d_loss())
            ref_cam = float(net.cam_smooth_vec_loss())
            ref_scale = float(net.scale_grid_smoothness_loss(mode="l1"))

        got_spatial = float(ours.spatial_loss(p, data, (H, W)))
        got_inter = float(ours.inter_frame_loss(p, data, (H, W)))
        got_inter_local = float(ours.inter_frame_loss_local(p, data, (H, W)))
        got_pts3d = float(ours.pts_3d_loss(p, data, (H, W), refine_K=False))
        got_cam = float(ours.cam_smooth_loss(p, data))
        got_scale = float(ours.scale_smoothness_loss(p))

    assert got_spatial == pytest.approx(ref_spatial, abs=1e-9, rel=1e-9)
    assert got_inter == pytest.approx(ref_inter, abs=1e-9, rel=1e-9)
    assert got_inter_local == pytest.approx(ref_inter_local, abs=1e-9, rel=1e-9)
    assert got_cam == pytest.approx(ref_cam, abs=1e-9, rel=1e-9)
    assert got_scale == pytest.approx(ref_scale, abs=1e-9, rel=1e-9)
    # the reference rounds pts_3d intermediates to f32 (refine_net.py:322,342)
    assert got_pts3d == pytest.approx(ref_pts3d, abs=1e-9, rel=5e-6)


def test_total_loss_parity(stacks):
    """Weighted total with the CLI's default weight dict
    (run_global_refine.py:61-67)."""
    from batrack_tpu.refine.refine_net import total_loss
    from batrack_tpu.utils.config import RefineConfig

    make_net, _, data, _ = stacks
    net = make_net(WEIGHTS_ALL)
    with torch.no_grad():
        ref_total = float(net())
    cfg = RefineConfig(grid_size=GRID, fixed_pose=True, fixed_K=True)
    with jax.enable_x64(True):
        got_total = float(total_loss(_params64(data), data, (H, W), cfg)[0])
    # pts_3d's f32 intermediates bound the achievable agreement
    assert got_total == pytest.approx(ref_total, rel=3e-6)


def test_adam_trajectory_parity(stacks):
    """8 matched Adam steps, cosine LR, fixed pose/K (trainer.py:23-59).

    pts_3d is excluded from the weights so the reference's f32
    intermediate casts don't inject f32 noise into the compared f64
    gradient flow; its value parity is covered separately above.
    """
    from batrack_tpu.refine.trainer import global_alignment_loop
    from batrack_tpu.utils.config import RefineConfig

    weights = {k: v for k, v in WEIGHTS_ALL.items() if k != "pts_3d_loss"}
    make_net, ref_trainer, data, _ = stacks
    net = make_net(weights)
    niter = 8
    ref_loss = ref_trainer.global_alignment_loop(
        net, lr=1e-2, niter=niter, schedule="cosine", lr_min=1e-6,
        fixed_pose=True, fixed_K=True,
    )

    cfg = RefineConfig(
        grid_size=GRID, niter=niter, lr=1e-2, schedule="cosine",
        fixed_pose=True, fixed_K=True, pts_3d_loss=0.0,
    )
    with jax.enable_x64(True):
        params, loss = global_alignment_loop(
            _params64(data), data, (H, W), cfg
        )
        np.testing.assert_allclose(
            np.asarray(params.trajs_scales),
            net.trajs_scales.detach().numpy(), atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(params.frame_scales),
            net.frame_scales_.detach().numpy(), atol=1e-9,
        )
    assert loss == pytest.approx(ref_loss, rel=1e-9)
