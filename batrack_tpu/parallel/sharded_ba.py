"""Edge-sharded bundle adjustment over a device mesh.

The BA reduction (ba.py:169-199 in the reference) is a sum over edges, so it
shards cleanly along the edge axis: each chip assembles partial normal
equations from its edge shard, one psum of the (W,W,6,6)/(W,K,6) blocks rides
the ICI, and the small pose solve is replicated (SURVEY.md §2/§5). No raw
edge data ever crosses chips.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from batrack_tpu.ba.solver import BAProblem, ba_iteration
from batrack_tpu.slam.state import SLAMState, StaticDims
from batrack_tpu.utils.config import SlamConfig

EDGE_FIELDS = ("targets", "weights", "ii", "jj", "kk", "valid")


def _prob_specs(axis: str):
    """PartitionSpecs for a BAProblem: edge fields sharded, rest replicated."""
    return BAProblem(
        poses=P(), patches=P(), monodisp=P(), intrinsics=P(),
        targets=P(axis), weights=P(axis), ii=P(axis), jj=P(axis), kk=P(axis),
        valid=P(axis), t0=P(), n=P(), base_k=P(),
    )


def sharded_ba_iteration(
    prob: BAProblem,
    mesh: Mesh,
    axis: str = "edge",
    **ba_kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One GN step with the edge axis sharded over `mesh`."""
    fn = functools.partial(ba_iteration, axis_name=axis, **ba_kwargs)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(_prob_specs(axis),),
        out_specs=(P(), P()),
    )
    return sharded(prob)


def sharded_slam_update(
    state: SLAMState,
    n: jnp.ndarray,
    initialized: jnp.ndarray,
    dims: StaticDims,
    cfg: SlamConfig,
    mesh: Mesh,
    axis: str = "edge",
) -> SLAMState:
    """Full backend update (ITER x dual BA + culling + cloud), edge-sharded.

    The BA runs under shard_map with psum'd Schur blocks; point-cloud
    maintenance shards over the patch-row axis (pure map, no collectives).
    """
    M = dims.M
    mid = (dims.S_local + 1) // 2 - 1
    t0 = jnp.where(initialized, jnp.maximum(n - cfg.OPTIMIZATION_WINDOW, 1), 1)
    base_k = jnp.maximum(n - dims.patch_window, 0) * M
    bounds = (0.0, 0.0, float(dims.wd), float(dims.ht))
    monodisp = state.local_targets[:, mid, 2]
    ii = state.e_kk // M

    def ba_pass(poses, patches, weights, structure_only):
        prob = BAProblem(
            poses=poses, patches=patches, monodisp=monodisp,
            intrinsics=state.intrinsics, targets=state.e_target[:, :2],
            weights=weights, ii=ii, jj=state.e_jj, kk=state.e_kk,
            valid=state.e_valid, t0=t0, n=n, base_k=base_k,
        )
        return sharded_ba_iteration(
            prob, mesh, axis,
            window=dims.window, patch_window=dims.patch_window,
            patches_per_frame=M, bounds=bounds, ep=cfg.BA_EP,
            lmbda=cfg.BA_LMBDA, alpha=cfg.BA_ALPHA, loss=cfg.LOSS,
            structure_only=structure_only,
        )

    poses, patches = state.poses, state.patches
    for _ in range(cfg.ITER):
        poses, patches = ba_pass(poses, patches, state.e_weight_pose, False)
        poses, patches = ba_pass(poses, patches, state.e_weight, True)
    state = state._replace(poses=poses, patches=patches)

    if cfg.USE_MAP_FILTERING:
        from batrack_tpu.geometry import projective

        def filter_shard(poses, patches, intr, e_jj, e_kk, e_t, e_w, e_wp):
            e_ii = e_kk // M
            coords, _, _ = projective.transform(poses, patches, intr, e_ii, e_jj, e_kk)
            ate = jnp.linalg.norm(coords - e_t[:, :2], axis=-1)
            keep = (ate < cfg.MAP_FILTERING_TH)[:, None].astype(jnp.float32)
            return e_w * keep, e_wp * keep

        e_w, e_wp = shard_map(
            filter_shard, mesh=mesh,
            in_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
        )(state.poses, state.patches, state.intrinsics, state.e_jj, state.e_kk,
          state.e_target, state.e_weight, state.e_weight_pose)
        state = state._replace(e_weight=e_w, e_weight_pose=e_wp)

    from batrack_tpu.slam.update import cloud_window_frames, update_point_cloud

    wf = cloud_window_frames(cfg, dims)
    return update_point_cloud(state, n, dims, window_frames=wf,
                              write_world=False)
