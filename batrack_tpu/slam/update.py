"""SLAM backend update: dual BA + map-point culling + point-cloud refresh.

Mirrors BATRACK.update (batrack.py:856-895), map_point_filtering (:327-332)
and update_point_cloud (:821-854) as one jitted function over the static
state. The reference runs this as ~hundreds of small CUDA kernels per frame;
here the entire 4x(pose BA + structure BA) + culling + point-cloud pass is a
single XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from batrack_tpu.ba import BAProblem, ba_iteration
from batrack_tpu.geometry import projective, se3
from batrack_tpu.slam.state import SLAMState, StaticDims
from batrack_tpu.utils.config import SlamConfig


def slam_update(
    state: SLAMState,
    n: jnp.ndarray,
    initialized: jnp.ndarray,
    dims: StaticDims,
    cfg: SlamConfig,
) -> SLAMState:
    """One full backend update (ITER x dual BA + culling + point cloud)."""
    M = dims.M
    mid = (dims.S_local + 1) // 2 - 1
    t0 = jnp.where(initialized, jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    base_k = jnp.maximum(n - dims.patch_window, 0) * M
    bounds = (0.0, 0.0, float(dims.wd), float(dims.ht))

    ii = state.e_kk // M

    def ba_pass(poses, patches, weights, structure_only):
        # The prior disparity is read from the local-trajectory mid slot,
        # exactly like the reference (batrack.py:866: patches_monodisp =
        # patches_local[..., (S_local+1)//2-1, 2:]). NOTE this is
        # deliberately reference-faithful, including its subtlety: for
        # weighted tracks update_point_cloud overwrites the mid slot with
        # the BA's own reprojected disparity (batrack.py:846-854 does the
        # same), so after the first update the alpha-prior anchors to the
        # previous estimate rather than the tracker/mono measurement.
        prob = BAProblem(
            poses=poses,
            patches=patches,
            monodisp=state.local_targets[:, mid, 2],
            intrinsics=state.intrinsics,
            targets=state.e_target[:, :2],
            weights=weights,
            ii=ii,
            jj=state.e_jj,
            kk=state.e_kk,
            valid=state.e_valid,
            t0=t0,
            n=n,
            base_k=base_k,
        )
        return ba_iteration(
            prob,
            window=dims.window,
            patch_window=dims.patch_window,
            patches_per_frame=M,
            bounds=bounds,
            ep=cfg.BA_EP,
            lmbda=cfg.BA_LMBDA,
            alpha=cfg.BA_ALPHA,
            loss=cfg.LOSS,
            structure_only=structure_only,
        )

    if cfg.BA_BACKEND == "slot":
        # dense slot-structured fast path (ba/slot_solver.py): the ring
        # layout is (slot, qs, m, s) so the flat edge arrays reshape directly
        from batrack_tpu.ba.slot_solver import SlotGraph, slot_ba_iteration

        R, NS, S = dims.ring_slots, dims.n_src, dims.S_slam

        def reshape_edges(x):
            return x.reshape((R, NS, M, S) + x.shape[1:])

        def slot_pass(poses, patches, weights, structure_only):
            graph = SlotGraph(
                targets=reshape_edges(state.e_target)[..., :2],
                weights=reshape_edges(weights),
                valid=reshape_edges(state.e_valid),
                slot_start=state.slot_start,
            )
            return slot_ba_iteration(
                poses, patches, state.local_targets[:, mid, 2],
                state.intrinsics, graph, t0, n, base_k,
                window=dims.window, patch_window=dims.patch_window,
                patches_per_frame=M, kf_stride=dims.kf_stride, bounds=bounds,
                ep=cfg.BA_EP, lmbda=cfg.BA_LMBDA, alpha=cfg.BA_ALPHA,
                loss=cfg.LOSS, structure_only=structure_only,
            )

        ba_pass = slot_pass

    def body(_, carry):
        poses, patches = carry
        # pose pass with static-only weights, then structure-only pass with
        # all weights (batrack.py:869-875)
        poses, patches = ba_pass(poses, patches, state.e_weight_pose, False)
        poses, patches = ba_pass(poses, patches, state.e_weight, True)
        return poses, patches

    poses, patches = jax.lax.fori_loop(0, cfg.ITER, body, (state.poses, state.patches))
    state = state._replace(poses=poses, patches=patches)

    # ---- map point culling (batrack.py:327-332, 887-889)
    if cfg.USE_MAP_FILTERING:
        coords, _, _ = projective.transform(
            poses, patches, state.intrinsics, ii, state.e_jj, state.e_kk
        )
        ate = jnp.linalg.norm(coords - state.e_target[:, :2], axis=-1)
        keep = (ate < cfg.MAP_FILTERING_TH)[:, None].astype(jnp.float32)
        state = state._replace(
            e_weight=state.e_weight * keep,
            e_weight_pose=state.e_weight_pose * keep,
        )

    # write_world=False: trajs_world (the reference's trajs_3d_world_ live-
    # viewer buffer, batrack.py:87) has no consumer in the per-frame loop;
    # its rows freeze once their frame leaves the window, so one full
    # write_world pass at read time (BATrack.world_trajectories) reproduces
    # the incrementally-maintained buffer exactly — skipping the dyn-branch
    # point cloud here saves ~40% of the cloud pass per update
    return update_point_cloud(
        state, n, dims, window_frames=cloud_window_frames(cfg, dims),
        write_world=False,
    )


def cloud_window_frames(cfg, dims: StaticDims) -> int:
    """Frames whose point-cloud rows can still mutate (single source of
    truth for the windowed update_point_cloud pass; also used by the sharded
    backends). A row changes only while its source frame is (a) inside the
    BA optimization window plus the S_local/2 reprojection margin, or
    (b) inside the S_slam append window (gate_and_append overwrites
    local_targets for the last S_slam frames every append). Since
    S_local = 2*S_slam - 1 (state.py:37), (S_local+1)//2 == S_slam and the
    margin term alone already covers (b) — the max() keeps the invariant
    explicit rather than incidental."""
    return min(
        dims.N,
        max(
            cfg.OPTIMIZATION_WINDOW + (dims.S_local + 1) // 2,
            dims.S_slam,
        ) + 1,
    )


def update_point_cloud(
    state: SLAMState,
    n: jnp.ndarray,
    dims: StaticDims,
    window_frames: int | None = None,
    write_world: bool = True,
) -> SLAMState:
    """Static + dynamic world-point maintenance (batrack.py:821-854).

    Tracks with any positive local weight are treated as static: their world
    trajectory collapses to the BA point, and their local 2D+disp trajectory
    is overwritten by reprojecting that point into the neighbouring frames
    (this is what stage-3 refinement consumes).

    window_frames: when set, only the rows of the last `window_frames`
    frames are recomputed. A row can change only while its source frame (or
    a neighbour within S_local/2) is inside the BA optimization window and
    its weights can still be appended (the S_slam window), so
    OPTIMIZATION_WINDOW + S_local//2 + 1 frames cover every mutable row —
    rows leave the window already holding their final values. The per-frame
    cost drops ~(N / window_frames)x (154 -> ~10 ms at BUFFER_SIZE=1024 on
    the v5e); the full pass (None) remains for tests and terminate-time
    verification.

    write_world: when False, skip the trajs_world buffer (and the dynamic-
    branch point cloud that feeds only it) — the local_targets overwrite,
    which the next BA's mono prior reads, is still applied. Because rows
    freeze once outside the window, a later full write_world pass yields
    the same trajs_world as incremental maintenance would have.
    """
    NM = state.patches.shape[0]
    M, S_local, N = dims.M, dims.S_local, dims.N
    mid = (S_local + 1) // 2 - 1

    if window_frames is None or window_frames >= N:
        base = jnp.asarray(0, jnp.int32)
        K = NM
        patches = state.patches
        local_targets = state.local_targets
        local_weights = state.local_weights
        row0 = jnp.asarray(0, jnp.int32)
    else:
        base = jnp.clip(n - window_frames, 0, N - window_frames)
        K = window_frames * M
        row0 = base * M
        patches = jax.lax.dynamic_slice_in_dim(state.patches, row0, K, axis=0)
        local_targets = jax.lax.dynamic_slice_in_dim(
            state.local_targets, row0, K, axis=0
        )
        local_weights = jax.lax.dynamic_slice_in_dim(
            state.local_weights, row0, K, axis=0
        )

    rows = row0 + jnp.arange(K)
    live = rows < n * M

    ix = rows // M
    # static world points of every patch (homogeneous -> xyz)
    P = projective.point_cloud(state.poses, patches, state.intrinsics, ix)
    static_xyz = P[:, :3] / jnp.where(jnp.abs(P[:, 3:]) > 1e-8, P[:, 3:], 1e-8)

    # dynamic world trajectories from the local target buffer (feeds only
    # trajs_world — skipped in the hot loop, see write_world)
    jj_w = jnp.clip(ix[:, None] + jnp.arange(S_local)[None, :] - mid, 0, N - 1)
    flat_jj = jj_w.reshape(-1)
    is_static = (local_weights.sum(axis=1) > 0)[:, None, None]
    if write_world:
        dyn_P = projective.point_cloud(
            state.poses,
            local_targets.reshape(-1, 3),
            state.intrinsics,
            flat_jj,
        )
        dyn_xyz = (
            dyn_P[:, :3]
            / jnp.where(jnp.abs(dyn_P[:, 3:]) > 1e-8, dyn_P[:, 3:], 1e-8)
        ).reshape(K, S_local, 3)
        trajs_world = jnp.where(is_static, static_xyz[:, None, :], dyn_xyz)

    # reproject static points into neighbour frames -> overwrite local targets
    G = jnp.take(state.poses, flat_jj, axis=0)
    P_rep = jnp.repeat(P, S_local, axis=0)
    X1 = se3.act4(G, P_rep)
    trg = projective.proj(X1, jnp.take(state.intrinsics, flat_jj, axis=0), depth=True)
    trg = trg.reshape(K, S_local, 3)
    new_targets = jnp.where(is_static & live[:, None, None], trg, local_targets)

    if window_frames is None or window_frames >= N:
        if write_world:
            trajs_world = jnp.where(
                live[:, None, None], trajs_world, state.trajs_world
            )
            return state._replace(
                trajs_world=trajs_world, local_targets=new_targets
            )
        return state._replace(local_targets=new_targets)

    if write_world:
        trajs_world = jnp.where(
            live[:, None, None], trajs_world,
            jax.lax.dynamic_slice_in_dim(state.trajs_world, row0, K, axis=0),
        )
        state = state._replace(
            trajs_world=jax.lax.dynamic_update_slice_in_dim(
                state.trajs_world, trajs_world, row0, axis=0
            )
        )
    return state._replace(
        local_targets=jax.lax.dynamic_update_slice_in_dim(
            state.local_targets, new_targets, row0, axis=0
        ),
    )
