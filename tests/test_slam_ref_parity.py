"""Full-loop SLAM parity: the reference BATRACK class vs our BATrack.

Imports /root/reference/main/batrack.py (torch CPU) and drives the ACTUAL
reference online loop — preprocess, patch buffers, motion model, factor
graph, 4x dual BA (the real ba.py), map-point culling, point-cloud refresh,
edge removal, terminate — side by side with our BATrack on the same
synthetic oracle scene, then asserts trajectory equality.

Harness:
  * torch_scatter + lietorch are replaced with the pure-torch stubs from
    test_ba_ref_parity (self-checked against our JAX group to 1e-12);
  * a TorchFunctionMode rewrites the reference's hardcoded device="cuda"
    tensors to CPU (the reference is single-GPU-only, batrack.py:73-105);
  * BOTH loops consume numerically identical tracker outputs: the reference's
    _compute_sparse_tracks is patched to call the same OracleTracker used by
    our loop (one instance per loop, same seed, same call schedule), so the
    comparison isolates the SLAM/BA machinery itself;
  * generate_patches is pinned to a fixed pixel grid on both sides so the
    factor graphs are built over identical patches.

Two variants: a static scene, and a scene with a rigidly-moving object whose
tracks the oracle labels dynamic — exercising the static/dynamic weight
split (weights_pose) through BOTH loops' gating code. Both run in float32;
the bound is calibrated by the f32 round-off divergence of two independent
implementations of the same damped GN fixed-point iteration — a
convention/semantics bug (Jacobian sign, gate mismatch, wrong window
arithmetic) shows up orders of magnitude above it.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_ba_ref_parity import _SE3, _scatter_sum
from test_tracker_ref_parity import _C, _install_stubs

from batrack_tpu.geometry import se3
from batrack_tpu.slam import BATrack, OracleTracker, StaticDims
from batrack_tpu.slam.frontend import TrackerInput
from batrack_tpu.utils.config import Config

# near-production conditioning: the reference hardcodes its BA damping
# (ep=10, batrack.py:861), which is tuned for ~500 px focal lengths — a toy
# 60 px-focal scene over-damps BOTH loops into the motion model (they still
# match each other, but the gt-sanity check below would be meaningless)
HT, WD = 240, 320
INTR = np.array([250.0, 250.0, WD / 2, HT / 2], np.float32)
PLANE_Z = 6.0
T_FRAMES = 32
M = 64
S_SLAM, KF = 4, 2
NUM_INIT = 4
BUFFER = 64
RW, OPT = 6, 5  # REMOVAL_WINDOW / OPTIMIZATION_WINDOW
KF_INDEX, KF_THRESH = 3, 1.0  # keyframe-removal knobs (stop-and-go test)
# module-level so scripts/ref_cpu_ab.py can sweep the config (VERDICT r4 #1)
# by patching these attributes — the test values above never change


class _CudaToCpu(torch.overrides.TorchFunctionMode):
    """Rewrite the reference's hardcoded device='cuda' to CPU."""

    def __torch_function__(self, func, types_, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs["device"] = "cpu"
        if func is torch.Tensor.cuda:
            return args[0]
        if func in (torch.Tensor.to, torch.Tensor.type_as):
            args = tuple(
                "cpu" if isinstance(a, (str, torch.device)) and "cuda" in str(a) else a
                for a in args
            )
        return func(*args, **kwargs)


def _install_loop_stubs():
    """lietorch/torch_scatter/altcorr/visualizer stubs + reference sys.path."""
    _install_stubs()  # timm + torchvision (md_tracker import chain)
    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = _scatter_sum
    sys.modules.setdefault("torch_scatter", ts)

    def _lt_module(name):
        lt = types.ModuleType(name)
        lt.SE3 = _SE3
        lt.Sim3 = _SE3

        def stack(groups, dim=0):
            return _SE3(torch.stack([g.data for g in groups], dim=dim))

        lt.stack = stack
        lt.cat = lambda groups, dim=0: _SE3(
            torch.cat([g.data for g in groups], dim=dim))
        return lt

    # ba.py resolves `backend.lietorch` (via `import backend.projective_ops`,
    # ba.py:3); batrack.py resolves `main.backend.lietorch` — stub both paths
    sys.modules.setdefault("backend.lietorch", _lt_module("backend.lietorch"))
    sys.modules.setdefault("main.backend.lietorch", _lt_module("main.backend.lietorch"))
    sys.modules.setdefault("main.backend.altcorr", types.ModuleType("main.backend.altcorr"))

    vis = types.ModuleType("main.slam_visualizer")

    class LEAPVisualizer:
        def __init__(self, cfg, save_dir=None):
            pass

        def add_frame(self, *a, **k):
            pass

        def add_track(self, *a, **k):
            pass

    vis.LEAPVisualizer = LEAPVisualizer
    sys.modules.setdefault("main.slam_visualizer", vis)

    for p in ("/root/reference", "/root/reference/main"):
        if p not in sys.path:
            sys.path.insert(0, p)


def _ref_cfg(tmpdir, use_keyframe=False):
    slam = _C(
        MOTION_MODEL="DAMPED_LINEAR", MOTION_DAMPING=0.5, BA_mode="rgbd_dual_ba",
        REMOVAL_WINDOW=RW, OPTIMIZATION_WINDOW=OPT, PATCHES_PER_FRAME=M,
        BUFFER_SIZE=BUFFER, PATCH_GEN="grid", ITER=2, LOSS="huber",
        USE_MAP_FILTERING=True, MAP_FILTERING_TH=5.0, MIN_TRACK_LEN=2,
        TRAJ_INIT=False, VIS_THRESHOLD=0.9, STATIC_THRESHOLD=0.1,
        STATIC_QUANTILE=0.0, S_slam=S_SLAM, kf_stride=KF, num_init=NUM_INIT,
        backward_tracking=False, use_keyframe=use_keyframe,
        # KEYFRAME_INDEX must be 1 mod kf_stride or removal never fires
        # (the reference's own parity trap, batrack.py:1029-1031)
        KEYFRAME_INDEX=KF_INDEX, KEYFRAME_THRESH=KF_THRESH,
    )
    model = _C(S=S_SLAM, mode="md_tracker", I=4)
    data = _C(savedir=str(tmpdir), name="parity")
    return _C(slam=slam, model=model, data=data)


def _our_cfg(use_keyframe=False) -> Config:
    cfg = Config()
    s = cfg.slam
    s.BUFFER_SIZE = BUFFER
    s.PATCHES_PER_FRAME = M
    s.PATCH_GEN = "sift"  # routed through coords_override -> fixed grid
    s.S_slam = S_SLAM
    s.kf_stride = KF
    s.num_init = NUM_INIT
    s.REMOVAL_WINDOW = RW
    s.OPTIMIZATION_WINDOW = OPT
    s.MIN_TRACK_LEN = 2
    s.ITER = 2
    s.BA_EP = 10.0  # the reference hardcodes ep=10 (batrack.py:861)
    s.use_keyframe = use_keyframe
    s.KEYFRAME_INDEX = KF_INDEX
    s.KEYFRAME_THRESH = KF_THRESH
    return cfg


def _grid_coords():
    """Fixed gx x gy pixel grid with exactly M points, identical for both
    loops (gx = gy = sqrt(M) when M is a perfect square)."""
    gy = int(np.sqrt(M))
    while M % gy:
        gy -= 1
    gx = M // gy
    xs = np.linspace(30, WD - 31, gx).round()
    ys = np.linspace(30, HT - 31, gy).round()
    x, y = np.meshgrid(xs, ys)
    return np.stack([x.reshape(-1), y.reshape(-1)], -1).astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    from batrack_tpu.utils.synth import parity_scene

    ts = np.arange(T_FRAMES, dtype=np.float32)
    return parity_scene(ts, HT, WD, INTR, se3, jnp, plane_z=PLANE_Z)


DYN_KW = dict(
    dynamic_velocity=np.array([0.03, 0.0, 0.0], np.float32),
    dynamic_region=lambda p: p[:, 0] > 1.0,
)


def _run_ours(scene, oracle_kw, use_keyframe=False, frame_times=None):
    """frame_times: optional list; perf_counter appended after every frame
    (scripts/ref_cpu_ab.py uses it to time the steady-state loop separately
    from the per-run jit retrace overhead). A scalar fetch from the donated
    state flushes XLA's async dispatch before each timestamp."""
    poses_gt, depths, images = scene
    cfg = _our_cfg(use_keyframe)
    dims = StaticDims.from_config(cfg, HT, WD)
    slam = BATrack(cfg, HT, WD, seed=0)
    slam.tracker = OracleTracker(poses_gt, INTR, dims, seed=1, **oracle_kw)

    import batrack_tpu.slam.ingest as ingest_mod

    orig = ingest_mod.generate_patches_sift
    ingest_mod.generate_patches_sift = (
        lambda image_np, M, ht, wd, rng: _grid_coords()
    )
    try:
        for t in range(T_FRAMES):
            slam(t, images[t], depths[t], INTR)
            if frame_times is not None:
                import time

                float(slam.state.poses[0, 0])  # flush async dispatch
                frame_times.append(time.perf_counter())
    finally:
        ingest_mod.generate_patches_sift = orig
    return slam.terminate() + (sorted(slam.delta.keys()),)


def _run_reference(scene, tmpdir, oracle_kw, use_keyframe=False,
                   frame_times=None):
    poses_gt, depths, images = scene
    _install_loop_stubs()
    from main.batrack import BATRACK

    cfg = _our_cfg(use_keyframe)
    dims = StaticDims.from_config(cfg, HT, WD)
    oracle = OracleTracker(poses_gt, INTR, dims, seed=1, **oracle_kw)
    grid = _grid_coords()

    def load_weights(self):
        self.network = None

    def generate_patches(self, image):
        coords = torch.tensor(grid)[None]  # (1, M, 2)
        ones = torch.ones(1, M, 1)
        patches = torch.cat([coords, ones], dim=-1).view(1, M, 3, 1, 1)
        return patches, torch.zeros(1, M, 3)

    def _compute_sparse_tracks(self, rgbds, queries):
        # rgbds (1, S_pad, 4, H, W) ORIGINAL resolution (the interp-resize of
        # the real method belongs to the network, which the oracle replaces);
        # queries (1, NQ, 4) [sid, x, y, depth]
        S_pad = rgbds.shape[1]
        S_win = len(self.local_window)
        # window-frame GLOBAL timestamps: after keyframe removal the buffer
        # rows are not the frame counters, so read tstamps_ (no-removal runs
        # reduce to range(n - S_win, n))
        ids = [int(self.tstamps_[i].item())
               for i in range(self.n - S_win, self.n)]
        ids += [ids[-1]] * (S_pad - S_win)
        nq = queries.shape[1]
        tin = TrackerInput(
            window_rgbd=jnp.asarray(rgbds[0].numpy()),
            queries=jnp.asarray(queries[0].numpy()),
            query_valid=jnp.ones(nq, bool),
            win_start=jnp.asarray(self.n - S_win, jnp.int32),
            win_tstamps=jnp.asarray(ids, jnp.int32),
        )
        tout = oracle(tin)
        tracks = torch.from_numpy(np.asarray(tout.tracks)).float()[None].clone()
        depths_t = torch.from_numpy(np.asarray(tout.depths)).float()[None, ..., None].clone()
        vis = torch.from_numpy(np.asarray(tout.vis)).float()[None].clone()
        dyn = torch.from_numpy(np.asarray(tout.dynamic)).float()[None].clone()
        # query-point overwrite (reference _compute_sparse_tracks:575-582)
        qt = queries[0, :, 0].to(torch.int64)
        ar = torch.arange(nq)
        tracks[0, qt, ar] = queries[0, :, 1:3].float()
        vis[0, qt, ar] = 1.0
        return tracks, depths_t, vis, {"dynamic_e": dyn}

    BATRACK.load_weights = load_weights
    BATRACK.generate_patches = generate_patches
    BATRACK._compute_sparse_tracks = _compute_sparse_tracks

    with _CudaToCpu():
        slam = BATRACK(_ref_cfg(tmpdir, use_keyframe), ht=HT, wd=WD)
        for t in range(T_FRAMES):
            img = torch.from_numpy(images[t]).permute(2, 0, 1)  # (3, H, W)
            dep = torch.from_numpy(depths[t])[None]             # (1, H, W)
            slam(t, img, dep, torch.tensor(INTR))
            if frame_times is not None:
                import time

                frame_times.append(time.perf_counter())
        return slam.terminate() + (sorted(slam.delta.keys()),)


# measured f32 round-off drift between the two implementations: the max
# per-frame pose difference grows LINEARLY at ~4e-5 m/frame (independent
# torch-vs-XLA solve orders inside an integrating trajectory); a semantics
# bug (gate/Jacobian/window mismatch) blows past this within a frame or two.
DRIFT_PER_FRAME = 1.2e-4  # 3x margin over the measured slope


@pytest.mark.parametrize(
    "oracle_kw,scale", [({}, 1.0), (DYN_KW, 2.0)], ids=["static", "dynamic"]
)
def test_full_loop_trajectory_matches_reference(scene, tmp_path, oracle_kw, scale):
    poses_ref, ts_ref, delta_ref = _run_reference(scene, tmp_path, oracle_kw)
    poses_our, ts_our, delta_our = _run_ours(scene, oracle_kw)
    assert delta_ref == delta_our == []
    assert poses_ref.shape == poses_our.shape == (T_FRAMES, 7)
    np.testing.assert_array_equal(ts_ref, ts_our)
    bound = scale * DRIFT_PER_FRAME * np.maximum(np.arange(T_FRAMES), 2)
    t_diff = np.abs(poses_ref[:, :3] - poses_our[:, :3]).max(axis=1)
    q_ref, q_our = poses_ref[:, 3:], poses_our[:, 3:]
    q_diff = np.abs(
        q_ref - q_our * np.sign((q_ref * q_our).sum(-1, keepdims=True))
    ).max(axis=1)
    assert (t_diff < bound).all(), f"translation diverges: {t_diff.max()}"
    assert (q_diff < bound).all(), f"rotation diverges: {q_diff.max()}"
    # and both recover the ground truth (sanity: the comparison is not
    # between two equally-broken trajectories)
    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene[0])))
    ate = np.sqrt(np.mean(np.sum((poses_our[:, :3] - gt_c2w[:, :3]) ** 2, -1)))
    assert ate < 0.2, ate


@pytest.fixture(scope="module")
def scene_stopgo():
    """Stop-and-go trajectory: two full pauses so the motion-magnitude
    keyframe removal (batrack.py:1026-1073) actually fires."""
    from batrack_tpu.utils.synth import parity_scene

    vel = np.ones(T_FRAMES, np.float32)
    vel[10:17] = 0.0
    vel[24:31] = 0.0
    ts = np.concatenate([[0.0], np.cumsum(vel)[:-1]]).astype(np.float32)
    return parity_scene(ts, HT, WD, INTR, se3, jnp, plane_z=PLANE_Z)


def test_keyframe_removal_matches_reference(scene_stopgo, tmp_path):
    """use_keyframe=True on a stop-and-go scene: the motion-magnitude
    removal, buffer shift, delta relpose memos (batrack.py:1026-1073) and
    terminate-time interpolation (batrack.py:898-915, 223-228) all compared
    against the reference loop. Requires >= 3 actual removals."""
    poses_ref, ts_ref, delta_ref = _run_reference(
        scene_stopgo, tmp_path, {}, use_keyframe=True
    )
    poses_our, ts_our, delta_our = _run_ours(scene_stopgo, {}, use_keyframe=True)

    # the same keyframes must have been removed, and enough of them that the
    # shift/memo machinery was genuinely exercised
    assert delta_ref == delta_our, (delta_ref, delta_our)
    assert len(delta_ref) >= 3, f"only {len(delta_ref)} removals; scene too easy"

    # terminate() reconstructs ALL counter frames (removed ones via delta)
    assert poses_ref.shape == poses_our.shape == (T_FRAMES, 7)
    np.testing.assert_array_equal(ts_ref, ts_our)

    bound = 2.0 * DRIFT_PER_FRAME * np.maximum(np.arange(T_FRAMES), 2)
    t_diff = np.abs(poses_ref[:, :3] - poses_our[:, :3]).max(axis=1)
    q_ref, q_our = poses_ref[:, 3:], poses_our[:, 3:]
    q_diff = np.abs(
        q_ref - q_our * np.sign((q_ref * q_our).sum(-1, keepdims=True))
    ).max(axis=1)
    assert (t_diff < bound).all(), f"translation diverges: {t_diff.max()}"
    assert (q_diff < bound).all(), f"rotation diverges: {q_diff.max()}"

    gt_c2w = np.asarray(se3.inv(jnp.asarray(scene_stopgo[0])))
    ate = np.sqrt(np.mean(np.sum((poses_our[:, :3] - gt_c2w[:, :3]) ** 2, -1)))
    assert ate < 0.2, ate
