"""Motion-magnitude keyframe removal (batrack.py:1011-1073, use_keyframe=True).

When the blended flow magnitude around frame k = n - KEYFRAME_INDEX is below
KEYFRAME_THRESH, frame k is deleted: its edges are invalidated, the edge
indices above it are decremented, and every per-frame/per-patch buffer shifts
down by one. All static-shape: the shift is a gather with indices
i + (i >= k), and removed rows keep their (now unused) tail values.

Frame deletion breaks the dense ring-slot addressing, so the SLAM system
forces the flat BA backend whenever use_keyframe is enabled
(slot_start is invalidated here to make any accidental slot use a no-op).
"""

from __future__ import annotations

import jax.numpy as jnp

from batrack_tpu.geometry import projective
from batrack_tpu.slam.state import SLAMState, StaticDims


def motion_magnitude(
    state: SLAMState, i: jnp.ndarray, j: jnp.ndarray, dims: StaticDims,
    beta: float = 0.5,
) -> jnp.ndarray:
    """Mean blended flow magnitude over edges (i -> j) (batrack.py:1011-1018)."""
    ii = state.e_kk // dims.M
    sel = (ii == i) & (state.e_jj == j) & (state.e_valid > 0)
    flow = projective.flow_mag(
        state.poses, state.patches, state.intrinsics,
        ii, state.e_jj, state.e_kk, beta=beta,
    )
    cnt = jnp.maximum(sel.sum(), 1)
    return jnp.where(sel, flow, 0.0).sum() / cnt


def motion_magnitude_pair(
    state: SLAMState, i: jnp.ndarray, j: jnp.ndarray, k: jnp.ndarray,
    dims: StaticDims, beta: float = 0.5,
) -> jnp.ndarray:
    """0.5 * (mag(i->k) + mag(j->k)) in one program (batrack.py:1026-1031).

    The keyframe decision needs both magnitudes; evaluating flow_mag once and
    selecting twice halves both the compute and — more importantly on a
    tunneled TPU — the host sync count (one scalar fetch per kf decision).
    """
    ii = state.e_kk // dims.M
    flow = projective.flow_mag(
        state.poses, state.patches, state.intrinsics,
        ii, state.e_jj, state.e_kk, beta=beta,
    )
    live = state.e_valid > 0

    def mean_sel(a):
        sel = (ii == a) & (state.e_jj == k) & live
        return jnp.where(sel, flow, 0.0).sum() / jnp.maximum(sel.sum(), 1)

    return 0.5 * (mean_sel(i) + mean_sel(j))


def remove_keyframe(
    state: SLAMState, k: jnp.ndarray, n: jnp.ndarray, dims: StaticDims
) -> SLAMState:
    """Delete frame k from all buffers and the factor graph.

    Mirrors batrack.py:1042-1066: edges touching k are removed; kk/ii/jj
    above k shift down; per-frame and per-patch buffers shift.
    """
    M, N = dims.M, dims.N

    ii = state.e_kk // M
    keep = ~((ii == k) | (state.e_jj == k))
    e_valid = state.e_valid * keep

    kk = jnp.where(ii > k, state.e_kk - M, state.e_kk)
    jj = jnp.where(state.e_jj > k, state.e_jj - 1, state.e_jj)

    # frame-axis shift: row i takes row i + (i >= k)
    fidx = jnp.arange(N)
    fsrc = jnp.clip(fidx + (fidx >= k), 0, N - 1)

    def shift_frame(x):
        return jnp.take(x, fsrc, axis=0)

    # patch-axis shift in units of M rows
    pidx = jnp.arange(N * M)
    psrc = jnp.clip(pidx + (pidx // M >= k) * M, 0, N * M - 1)

    def shift_patch(x):
        return jnp.take(x, psrc, axis=0)

    return state._replace(
        tstamps=shift_frame(state.tstamps),
        poses=shift_frame(state.poses),
        intrinsics=shift_frame(state.intrinsics),
        patches=shift_patch(state.patches),
        patches_valid=shift_patch(state.patches_valid),
        colors=shift_patch(state.colors),
        local_targets=shift_patch(state.local_targets),
        local_vis=shift_patch(state.local_vis),
        local_static=shift_patch(state.local_static),
        local_weights=shift_patch(state.local_weights),
        trajs_world=shift_patch(state.trajs_world),
        e_kk=kk,
        e_jj=jj,
        e_valid=e_valid,
        slot_start=jnp.full_like(state.slot_start, -1),  # slot addressing broken
    )


def remove_window_frame(state: SLAMState, win_idx: jnp.ndarray, dims: StaticDims) -> SLAMState:
    """Drop one frame from the rolling raw-frame window (local_window.pop).

    The window keeps its newest frame at slot S-1, so frames before the
    removed slot shift toward the end and the (stale) front slot duplicates —
    it sits in the padding region until enough new frames arrive.
    """
    S = dims.S_slam
    sidx = jnp.arange(S)
    src = jnp.clip(sidx - (sidx <= win_idx), 0, S - 1)
    return state._replace(
        win_images=jnp.take(state.win_images, src, axis=0),
        win_depths=jnp.take(state.win_depths, src, axis=0),
    )
