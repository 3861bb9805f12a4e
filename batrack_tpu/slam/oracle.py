"""Oracle tracker: ground-truth reprojection tracks for framework testing.

Fills the tracker slot (SURVEY.md §7 minimum slice) with perfect static
tracks computed from known poses + depth maps, letting the whole SLAM
skeleton (patches, factor graph, BA, keyframing, export) be exercised and
validated end-to-end before the learned tracker exists. The reference
supports the same decomposition since its tracker sits behind one call
boundary (batrack.py:553-557).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from batrack_tpu.geometry import se3
from batrack_tpu.ops.sampling import bilinear_sample2d
from batrack_tpu.slam.frontend import TrackerInput, TrackerOutput
from batrack_tpu.slam.state import StaticDims


class OracleTracker:
    """Reprojects each query into every window frame using gt geometry.

    gt_poses: (T, 7) world-to-camera SE3 for every global frame.
    intrinsics: (4,) shared pinhole.
    noise: optional pixel-noise scale.
    dynamic_velocity: optional (3,) world-space velocity (units/frame) applied
        to points selected by dynamic_region — a rigidly moving object. The
        oracle then labels those tracks dynamic=1, exercising the
        motion-decoupled gating (weights_pose, slam/frontend.py:153-169) the
        same way the learned MotionLabelBlock does (md_tracker.py:327-330).
    dynamic_region: jnp predicate (NQ, 3) world points -> (NQ,) bool.
    """

    def __init__(self, gt_poses, intrinsics, dims: StaticDims, noise: float = 0.0,
                 seed: int = 0, dynamic_velocity=None, dynamic_region=None):
        self.gt_poses = jnp.asarray(gt_poses, jnp.float32)
        self.intrinsics = jnp.asarray(intrinsics, jnp.float32)
        self.dims = dims
        self.noise = noise
        self.dynamic_velocity = (
            None if dynamic_velocity is None
            else jnp.asarray(dynamic_velocity, jnp.float32)
        )
        self.dynamic_region = dynamic_region
        self.key = jax.random.PRNGKey(seed)
        self._apply = jax.jit(functools.partial(self._forward, dims=dims))

    def _forward(self, tin: TrackerInput, gt_poses, intrinsics, key, dims: StaticDims):
        S, H, W = dims.S_slam, dims.ht, dims.wd
        sid = tin.queries[:, 0].astype(jnp.int32)
        # use global frame counters so removed keyframes don't shift the map
        q_frame = jnp.clip(jnp.take(tin.win_tstamps, sid), 0, gt_poses.shape[0] - 1)

        # depth at the query from its own window frame (use provided depth
        # channel of the rgbd window for realism). Sample every frame at the
        # query coords and select by source id — gathering a full map per
        # query (depth_maps[sid]) materialises an (NQ, H, W) array.
        depth_maps = tin.window_rgbd[:, 3]  # (S, H, W)
        NQ = tin.queries.shape[0]
        xq, yq = tin.queries[:, 1], tin.queries[:, 2]
        d_all = bilinear_sample2d(
            depth_maps[:, None],
            jnp.broadcast_to(xq[None], (S, NQ)),
            jnp.broadcast_to(yq[None], (S, NQ)),
        )[:, 0]  # (S, NQ)
        d = jnp.take_along_axis(d_all, sid[None], axis=0)[0]
        d = jnp.maximum(d, 1e-2)

        # world point
        fx, fy, cx, cy = intrinsics
        X0 = jnp.stack(
            [(xq - cx) / fx * d, (yq - cy) / fy * d, d, jnp.ones_like(d)], axis=-1
        )
        c2w = se3.inv(jnp.take(gt_poses, q_frame, axis=0))
        Pw = se3.act4(c2w, X0)

        # project into all window frames
        w_frames = jnp.clip(tin.win_tstamps, 0, gt_poses.shape[0] - 1)
        G = jnp.take(gt_poses, w_frames, axis=0)  # (S, 7)
        if self.dynamic_velocity is not None:
            dyn_mask = self.dynamic_region(Pw[:, :3])  # (NQ,)
            dt = (w_frames[:, None] - q_frame[None, :]).astype(jnp.float32)
            disp = dt[..., None] * self.dynamic_velocity  # (S, NQ, 3)
            Pw_t = Pw[None, :, :3] + jnp.where(dyn_mask[None, :, None], disp, 0.0)
            Pw_t = jnp.concatenate(
                [Pw_t, jnp.ones(Pw_t.shape[:-1] + (1,), Pw_t.dtype)], axis=-1
            )
            Xc = se3.act4(G[:, None, :], Pw_t)  # (S, NQ, 4)
        else:
            dyn_mask = jnp.zeros(Pw.shape[0], bool)
            Xc = se3.act4(G[:, None, :], Pw[None, :, :])  # (S, NQ, 4)
        z = jnp.maximum(Xc[..., 2], 1e-2)
        x = fx * Xc[..., 0] / z + cx
        y = fy * Xc[..., 1] / z + cy

        if self.noise > 0:
            k1, _ = jax.random.split(key)
            xy_noise = self.noise * jax.random.normal(k1, x.shape + (2,))
            x = x + xy_noise[..., 0]
            y = y + xy_noise[..., 1]

        vis = ((x >= 0) & (x < W) & (y >= 0) & (y < H) & (Xc[..., 2] > 0.05)).astype(
            jnp.float32
        )
        return TrackerOutput(
            tracks=jnp.stack([x, y], axis=-1),
            depths=z,
            vis=vis,
            dynamic=jnp.broadcast_to(
                dyn_mask.astype(jnp.float32)[None, :], z.shape
            ),
        )

    def __call__(self, tin: TrackerInput) -> TrackerOutput:
        self.key, sub = jax.random.split(self.key)
        return self._apply(tin, self.gt_poses, self.intrinsics, sub)
