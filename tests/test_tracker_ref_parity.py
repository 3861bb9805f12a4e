"""Full-forward MDTracker parity against the *actual* reference network.

Imports /root/reference/main/frontend/md_tracker.py (torch) with two
dependency stubs (timm's Attention/Mlp, torchvision.transforms), converts a
randomly-initialised checkpoint-shaped state_dict with tracker/convert.py,
and asserts forward parity of the Flax rebuild: single window, multi-window
sliding + handoff, late-appearing queries (sort/wind_idx semantics), and the
backward-tracking merge (batrack.py:590-629).

The architecture is the reference one except for transformer depths (2/1
time/space, 1/1 dyn) — input_dim=456 pins latent_dim=128, corr_levels=4,
corr_radius=3, so those stay production-size.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from batrack_tpu.tracker.convert import convert_state_dict
from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

S_WIN = 4
STRIDE = 4
H, W = 64, 96
DEPTHS = dict(time_depth=2, space_depth=1, time_depth_dyn=1, space_depth_dyn=1)


from batrack_tpu.utils.refimport import (  # shared with validate_checkpoint
    ConfigNode as _C,
    install_reference_stubs as _install_stubs,
)


def _ref_cfg():
    model = _C(
        Embed3D=True,
        use_log_depth=False,
        static_iters=2,
        sliding_window_len=S_WIN,
        model_stride=STRIDE,
        dynamic_mask_detach=True,
        hidden_dim=256,
        latent_dim=128,
        corr_levels=4,
        corr_radius=3,
        add_space_attn=True,
        hidden_size=384,
        num_heads=8,
        space_depth=DEPTHS["space_depth"],
        time_depth=DEPTHS["time_depth"],
        space_depth_dyn=DEPTHS["space_depth_dyn"],
        time_depth_dyn=DEPTHS["time_depth_dyn"],
        motion_label_block=_C(mode="mlp_v1", in_dim=128, hidden_dim=256, S=8),
    )
    return _C(model=model)


@pytest.fixture(scope="module")
def nets():
    """(torch_net, converted_params). Iteration counts are chosen per test:
    the iterative corr refinement is chaotic under random weights (a 1e-5
    input perturbation amplifies ~300x per iteration through the correlation
    landscape of near-white feature maps), so strict parity is asserted at
    iters=1/static_iters=1 — every plumbing/semantic divergence found so far
    (corr window transpose, GroupNorm axes, motion-label pooling, track-mask
    zeroing) is visible there — and the production 4/2 config gets a
    chaos-budgeted tolerance."""
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from main.frontend.md_tracker import MDTracker as TorchMDTracker

    torch.manual_seed(0)
    tnet = TorchMDTracker(_ref_cfg())
    tnet.eval()

    params = convert_state_dict(tnet.state_dict(), **DEPTHS)
    return tnet, params


def _jnet(iters=1, static_iters=1):
    return MDTracker(TrackerParams(
        S=S_WIN, stride=STRIDE, iters=iters, static_iters=static_iters,
        **DEPTHS,
    ))


def _scene(T, n_queries, first_inds, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0, 255, size=(T, 3, H, W)).astype(np.float32)
    # smooth-ish positive depth with spatial structure
    base = rng.uniform(2.0, 6.0, size=(T, 1, H // 8, W // 8)).astype(np.float32)
    depth = np.kron(base, np.ones((1, 1, 8, 8), np.float32))[:, 0]
    rgbd = np.concatenate([rgb, depth[:, None]], axis=1)  # (T, 4, H, W)

    q = np.zeros((n_queries, 4), np.float32)
    q[:, 0] = first_inds
    q[:, 1] = rng.uniform(8, W - 8, n_queries)
    q[:, 2] = rng.uniform(8, H - 8, n_queries)
    for i in range(n_queries):
        x, y = int(q[i, 1]), int(q[i, 2])
        q[i, 3] = depth[int(q[i, 0]), y, x]
    return rgbd, q


def _run_torch(tnet, rgbd, queries, iters=1, static_iters=1):
    tnet.static_iters = static_iters
    with torch.no_grad():
        out = tnet(
            rgbds=torch.from_numpy(rgbd)[None].clone(),
            queries=torch.from_numpy(queries)[None].clone(),
            iters=iters,
        )
    traj, _, depth, static3d, vis, dyn, _ = out
    return (traj[0].numpy(), depth[0, ..., 0].numpy(), static3d[0].numpy(),
            vis[0].numpy(), dyn[0].numpy())


def _run_jax(jnet, params, rgbd, queries):
    traj, depth, static3d, vis, dyn, _ = jnet.apply(
        params, jnp.asarray(rgbd), jnp.asarray(queries)
    )
    return (np.asarray(traj), np.asarray(depth), np.asarray(static3d),
            np.asarray(vis), np.asarray(dyn))


def _envelope(tnet, rgbd, q, iters=1, static_iters=1, eps=1e-4):
    """Torch self-sensitivity: output spread under an eps-px query shift.

    The iterative corr refinement is chaotic under random weights, so
    backend float noise (conv reduction order, ~3e-5 on the feature maps)
    amplifies through the sinusoidal flow embeddings and the correlation
    landscape. The honest parity bar is therefore the reference's OWN
    spread under a same-order input perturbation, measured per scenario.
    """
    base = _run_torch(tnet, rgbd, q, iters=iters, static_iters=static_iters)
    qp = q.copy()
    qp[:, 1:3] += eps
    pert = _run_torch(tnet, rgbd, qp, iters=iters, static_iters=static_iters)
    return tuple(float(np.abs(p - b).max()) for p, b in zip(pert, base))


def _assert_close(ours, ref, tol_px, tol_prob, written=None, env=None):
    """env: optional per-output chaos envelope (traj, depth, static, vis,
    dyn) from _envelope; effective tolerance is max(floor, 3*env) so clean
    low-iteration scenarios keep a tight floor (a semantic bug there shows
    up orders of magnitude above the envelope — e.g. the concat-scramble
    sort bug measured 1.4 px against a 2.7e-4 px envelope)."""
    t_traj, t_depth, t_static, t_vis, t_dyn = ref
    j_traj, j_depth, j_static, j_vis, j_dyn = ours
    if written is None:
        written = np.ones(t_traj.shape[:2], bool)
    if env is None:
        env = (0.0,) * 5
    w3 = written[..., None]
    tols = [max(tol_px, 3 * env[0]), max(tol_px, 3 * env[1]),
            max(tol_px, 3 * env[2]), max(tol_prob, 3 * env[3]),
            max(tol_prob, 3 * env[4])]
    assert np.abs(np.where(w3, j_traj - t_traj, 0)).max() < tols[0]
    assert np.abs(np.where(written, j_depth - t_depth, 0)).max() < tols[1]
    assert np.abs(np.where(w3, j_static - t_static, 0)).max() < tols[2]
    assert np.abs(np.where(written, j_vis - t_vis, 0)).max() < tols[3]
    assert np.abs(np.where(written, j_dyn - t_dyn, 0)).max() < tols[4]


@pytest.mark.slow
class TestReferenceNetParity:
    def test_single_window(self, nets):
        tnet, params = nets
        rgbd, q = _scene(T=S_WIN, n_queries=6, first_inds=[0, 0, 1, 2, 0, 3])
        ref = _run_torch(tnet, rgbd, q)
        ours = _run_jax(_jnet(), params, rgbd, q)
        env = _envelope(tnet, rgbd, q)
        _assert_close(ours, ref, tol_px=1e-3, tol_prob=1e-4, env=env)

    def test_single_window_production_iters(self, nets):
        """Full 4/2 iteration config: the chaos budget dominates (see the
        nets fixture docstring); assert against the measured amplification
        envelope rather than numeric drift."""
        tnet, params = nets
        rgbd, q = _scene(T=S_WIN, n_queries=6, first_inds=[0, 0, 1, 2, 0, 3])
        ref = _run_torch(tnet, rgbd, q, iters=4, static_iters=2)
        ours = _run_jax(_jnet(iters=4, static_iters=2), params, rgbd, q)
        env = _envelope(tnet, rgbd, q, iters=4, static_iters=2)
        _assert_close(ours, ref, tol_px=0.5, tol_prob=0.1, env=env)

    def test_multi_window_sliding_handoff(self, nets):
        """T=8 -> 3 overlapping windows with coord/vis/dyn state handoff."""
        tnet, params = nets
        rgbd, q = _scene(T=8, n_queries=6, first_inds=[0] * 6, seed=1)
        ref = _run_torch(tnet, rgbd, q)
        ours = _run_jax(_jnet(), params, rgbd, q)
        env = _envelope(tnet, rgbd, q)
        _assert_close(ours, ref, tol_px=5e-3, tol_prob=1e-3, env=env)

    def test_multi_window_late_queries(self, nets):
        """Queries appearing mid-sequence: sort/wind_idx activity semantics
        (the reference runs the transformer only on active tracks)."""
        tnet, params = nets
        first = [0, 0, 3, 5, 1, 6]
        rgbd, q = _scene(T=8, n_queries=6, first_inds=first, seed=2)
        ref = _run_torch(tnet, rgbd, q)
        ours = _run_jax(_jnet(), params, rgbd, q)
        # entries never covered by a window that had the query active differ
        # (both nets leave zeros, but window overwrites differ in padding
        # frames) — compare where the reference wrote real predictions
        T = 8
        written = np.zeros((T, len(first)), bool)
        ind = 0
        order = np.argsort(first, kind="stable")
        sorted_first = np.asarray(first)[order]
        while ind < T - S_WIN // 2:
            cnt = int((sorted_first < ind + S_WIN).sum())
            if cnt:
                cols = order[:cnt]
                written[ind:ind + S_WIN, cols] = True
            ind += S_WIN // 2
        ref_w = tuple(r for r in ref)
        env = _envelope(tnet, rgbd, q)
        _assert_close(ours, ref_w, tol_px=5e-3, tol_prob=1e-3,
                      written=written, env=env)

    def test_backward_tracking_merge(self, nets):
        """batrack.py:590-629: run the net on the flipped window, merge where
        forward tracks are zero. Parity of the merged output."""
        tnet, params = nets
        jnet = _jnet()
        T = 8
        first = [0, 2, 4, 0, 6, 1]
        rgbd, q = _scene(T=T, n_queries=6, first_inds=first, seed=3)

        # torch side: replicate _compute_backward_tracks
        traj, depth, static3d, vis, dyn = _run_torch(tnet, rgbd, q)
        inv_rgbd = rgbd[::-1].copy()
        inv_q = q.copy()
        inv_q[:, 0] = T - 1 - inv_q[:, 0]
        itraj, idepth, _, ivis, _ = _run_torch(tnet, inv_rgbd, inv_q)
        itraj, idepth, ivis = itraj[::-1], idepth[::-1], ivis[::-1]
        mask = traj == 0.0
        t_traj = np.where(mask, itraj, traj)
        m0 = mask[..., 0]
        t_depth = np.where(m0, idepth, depth)
        t_vis = np.where(m0, ivis, vis)

        # jax side: same recipe through our model
        jtraj, jdepth, _, jvis, _ = _run_jax(jnet, params, rgbd, q)
        jitraj, jidepth, _, jivis, _ = _run_jax(
            jnet, params, inv_rgbd, inv_q
        )
        jitraj, jidepth, jivis = jitraj[::-1], jidepth[::-1], jivis[::-1]
        jmask = jtraj == 0.0
        j_traj = np.where(jmask, jitraj, jtraj)
        jm0 = jmask[..., 0]
        j_depth = np.where(jm0, jidepth, jdepth)
        j_vis = np.where(jm0, jivis, jvis)

        assert (jmask == mask).mean() > 0.99
        env_f = _envelope(tnet, rgbd, q)
        env_b = _envelope(tnet, inv_rgbd, inv_q)
        tol_px = max(5e-3, 3 * max(env_f[0], env_b[0], env_f[1], env_b[1]))
        tol_v = max(1e-3, 3 * max(env_f[3], env_b[3]))
        both = mask[..., 0] == jmask[..., 0]
        assert np.abs(np.where(both[..., None], j_traj - t_traj, 0)).max() < tol_px
        assert np.abs(np.where(both, j_depth - t_depth, 0)).max() < tol_px
        assert np.abs(np.where(both, j_vis - t_vis, 0)).max() < tol_v
