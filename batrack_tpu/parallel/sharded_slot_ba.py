"""Patch-sharded slot-structured BA: the production multi-chip backend.

The dense slot graph (ba/slot_solver.py) has axes (slot, src, M, S); the
patch axis M (400/frame in production) divides any practical device count
and keeps the dense per-edge layout intact on every shard. Each device
owns M/D patches of EVERY frame:

  * residuals, Jacobians and the per-patch C/w/E pieces are complete
    locally (all slot groups are replicated, only patches split);
  * one psum of the (W,W,6,6) pose blocks + (W*6,W*6) Schur contribution
    + (W*6,) rhs rides the interconnect per GN step;
  * the tiny pose solve is replicated; depth updates stay shard-local.

This is the distributed-Schur layout SURVEY.md §5 prescribes — per-patch
data never crosses devices, collectives carry only O(W²·36) floats. The
same specs work on a multi-host ('host','chip') mesh: pass the full axis
tuple and the psum reduces over both axes (parallel/mesh.py).
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from batrack_tpu.ba.slot_solver import SlotGraph, slot_ba_iteration_fm
from batrack_tpu.slam.state import SLAMState, StaticDims
from batrack_tpu.utils.config import SlamConfig

Axis = Union[str, Tuple[str, ...]]


def full_axis(mesh: Mesh) -> Axis:
    """The whole mesh as one logical axis (tuple form for 2D host/chip)."""
    names = tuple(mesh.axis_names)
    return names if len(names) > 1 else names[0]


def sharded_slot_slam_update(
    state: SLAMState,
    n: jnp.ndarray,
    initialized: jnp.ndarray,
    dims: StaticDims,
    cfg: SlamConfig,
    mesh: Mesh,
    axis: Axis | None = None,
) -> SLAMState:
    """Full backend update (ITER x dual BA + culling + cloud), patch-sharded.

    Drop-in for slam_update (slam/update.py) when a mesh is configured;
    trajectory-equal to the single-device slot path (tests/test_parallel.py;
    __graft_entry__.dryrun_multichip drives the whole SLAM loop through it).
    """
    if axis is None:
        axis = full_axis(mesh)
    M, Nf = dims.M, dims.N
    R, NS, S = dims.ring_slots, dims.n_src, dims.S_slam
    mid = (dims.S_local + 1) // 2 - 1
    t0 = jnp.where(initialized, jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    base_f = jnp.maximum(n - dims.patch_window, 0)
    bounds = (0.0, 0.0, float(dims.wd), float(dims.ht))

    def reshape_edges(x):
        return x.reshape((R, NS, M, S) + x.shape[1:])

    ba_core = functools.partial(
        slot_ba_iteration_fm,
        window=dims.window, patch_window=dims.patch_window,
        patches_per_frame=M, kf_stride=dims.kf_stride, bounds=bounds,
        ep=cfg.BA_EP, lmbda=cfg.BA_LMBDA, alpha=cfg.BA_ALPHA, loss=cfg.LOSS,
        axis_name=axis, shard_mode="patches",
    )

    # patch-axis (M) sharding specs; slot/group axes and poses replicated
    g_spec = SlotGraph(targets=P(None, None, axis), weights=P(None, None, axis),
                       valid=P(None, None, axis), slot_start=P())
    pm_spec = P(None, axis)

    def dual_iters(poses, patches_fm, monodisp_fm, intr, graph_w, graph_wp):
        for _ in range(cfg.ITER):
            # pose pass with static-only weights, then structure-only pass
            # with all weights (batrack.py:869-875)
            poses, patches_fm = ba_core(
                poses, patches_fm, monodisp_fm, intr, graph_wp,
                t0, n, base_f, structure_only=False,
            )
            poses, patches_fm = ba_core(
                poses, patches_fm, monodisp_fm, intr, graph_w,
                t0, n, base_f, structure_only=True,
            )
        return poses, patches_fm

    tgt3 = reshape_edges(state.e_target)
    val = reshape_edges(state.e_valid)
    graph_w = SlotGraph(targets=tgt3[..., :2], weights=reshape_edges(state.e_weight),
                        valid=val, slot_start=state.slot_start)
    graph_wp = SlotGraph(targets=tgt3[..., :2],
                         weights=reshape_edges(state.e_weight_pose),
                         valid=val, slot_start=state.slot_start)

    poses, patches_fm = shard_map(
        dual_iters, mesh=mesh,
        in_specs=(P(), pm_spec, pm_spec, P(), g_spec, g_spec),
        out_specs=(P(), pm_spec),
    )(state.poses, state.patches.reshape(Nf, M, 3),
      state.local_targets[:, mid, 2].reshape(Nf, M), state.intrinsics,
      graph_w, graph_wp)
    state = state._replace(poses=poses, patches=patches_fm.reshape(Nf * M, 3))

    # ---- map point culling (batrack.py:327-332): per-edge, patch-sharded
    if cfg.USE_MAP_FILTERING:
        from batrack_tpu.geometry import projective

        def filter_shard(poses, patches_fm, intr, slot_start, e_t, e_w, e_wp):
            Mb = patches_fm.shape[1]
            i_cl = jnp.clip(
                slot_start[:, None] + jnp.arange(NS) * dims.kf_stride, 0, Nf - 1
            )                                            # (R, NS)
            j_cl = jnp.clip(
                slot_start[:, None] + jnp.arange(S), 0, Nf - 1
            )                                            # (R, S)
            shape = (R, NS, Mb, S)
            ii = jnp.broadcast_to(i_cl[:, :, None, None], shape).reshape(-1)
            jj = jnp.broadcast_to(j_cl[:, None, None, :], shape).reshape(-1)
            mm = jnp.broadcast_to(
                jnp.arange(Mb)[None, None, :, None], shape
            ).reshape(-1)
            kk = ii * Mb + mm                            # local flat patch ids
            coords, _, _ = projective.transform(
                poses, patches_fm.reshape(-1, 3), intr, ii, jj, kk
            )
            ate = jnp.linalg.norm(coords - e_t.reshape(-1, 2), axis=-1)
            keep = (ate < cfg.MAP_FILTERING_TH).astype(jnp.float32)
            keep = keep.reshape(shape + (1,))
            return e_w * keep, e_wp * keep

        e_w, e_wp = shard_map(
            filter_shard, mesh=mesh,
            in_specs=(P(), pm_spec, P(), P(), g_spec.targets,
                      g_spec.targets, g_spec.targets),
            out_specs=(g_spec.targets, g_spec.targets),
        )(state.poses, state.patches.reshape(Nf, M, 3), state.intrinsics,
          state.slot_start, tgt3[..., :2], reshape_edges(state.e_weight),
          reshape_edges(state.e_weight_pose))
        state = state._replace(
            e_weight=e_w.reshape(-1, 2), e_weight_pose=e_wp.reshape(-1, 2)
        )

    from batrack_tpu.slam.update import cloud_window_frames, update_point_cloud

    wf = cloud_window_frames(cfg, dims)
    return update_point_cloud(state, n, dims, window_frames=wf,
                              write_world=False)
