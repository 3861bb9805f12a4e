"""Tracker frontend: query construction, gating, and factor-graph append.

Static-shape rebuild of batrack.py get_queries (:459-480), get_window_trajs
(:667-757), predict_target (:760-818), update_local (:632-663) and __edges
(:399-410). All quantities live on fixed (n_src, M, S_slam) grids with
validity masks instead of the reference's exact-size tensors.

Layout note: the reference flattens edges as 'b (s1 m s) c' (predict_target
:767) — source-slot-major, then patch, then target frame. The (n_src, M,
S_slam) grid here flattens to exactly that order.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from batrack_tpu.ops.sampling import bilinear_sample2d
from batrack_tpu.slam.state import SLAMState, StaticDims


class TrackerInput(NamedTuple):
    window_rgbd: jnp.ndarray   # (S_slam, 4, H, W) images 0..255 + depth
    queries: jnp.ndarray       # (NQ, 4) [sid, x, y, depth]; sid in window time
    query_valid: jnp.ndarray   # (NQ,) bool
    win_start: jnp.ndarray     # () buffer frame id of window slot 0
    win_tstamps: jnp.ndarray   # (S_slam,) global frame counter per window slot


class TrackerOutput(NamedTuple):
    tracks: jnp.ndarray   # (S_slam, NQ, 2) pixel coords
    depths: jnp.ndarray   # (S_slam, NQ) metric depth
    vis: jnp.ndarray      # (S_slam, NQ) visibility in [0, 1]
    dynamic: jnp.ndarray  # (S_slam, NQ) dynamic probability in [0, 1]


def build_tracker_input(state: SLAMState, n: jnp.ndarray, dims: StaticDims) -> TrackerInput:
    """Assemble the padded tracker window + queries for frame count n.

    The window holds frames [n - S, n) (S = min(n, S_slam)) followed by the
    last frame repeated (get_window_trajs :692-694). Queries are patch
    centers of frames n-S, n-S+kf, ... with bilinear depth (:675-684).
    """
    S_slam, M, kf = dims.S_slam, dims.M, dims.kf_stride
    S = jnp.minimum(n, S_slam)

    # win_images slot for global frame f is f - n + S_slam
    s_idx = jnp.arange(S_slam)
    src_slot = jnp.where(s_idx < S, S_slam - S + s_idx, S_slam - 1)
    images = jnp.take(state.win_images, src_slot, axis=0)   # (S, H, W, 3)
    depths = jnp.take(state.win_depths, src_slot, axis=0)   # (S, H, W)
    window_rgbd = jnp.concatenate(
        [jnp.moveaxis(images, -1, 1), depths[:, None]], axis=1
    )

    # queries: source slot qs -> window sid = qs * kf, global frame n - S + sid
    qs = jnp.arange(dims.n_src)
    sid = qs * kf
    q_frame = n - S + sid                                   # (n_src,)
    nq_valid = (S + kf - 1) // kf
    q_valid = qs < nq_valid

    patch_rows = q_frame[:, None] * M + jnp.arange(M)[None, :]  # (n_src, M)
    patch_rows = jnp.clip(patch_rows, 0, state.patches.shape[0] - 1)
    xy = jnp.take(state.patches[:, :2], patch_rows.reshape(-1), axis=0)

    # depth at the query pixel from the window depth map of its own frame
    q_slot = jnp.clip(S_slam - S + sid, 0, S_slam - 1)
    d_src = jnp.take(state.win_depths, q_slot, axis=0)       # (n_src, H, W)
    xy_g = xy.reshape(dims.n_src, M, 2)
    d = bilinear_sample2d(d_src[:, None], xy_g[..., 0], xy_g[..., 1])[:, 0]  # (n_src, M)

    queries = jnp.concatenate(
        [
            jnp.broadcast_to(sid[:, None, None], (dims.n_src, M, 1)).astype(jnp.float32),
            xy_g,
            d[..., None],
        ],
        axis=-1,
    ).reshape(dims.n_src * M, 4)
    query_valid = jnp.broadcast_to(q_valid[:, None], (dims.n_src, M)).reshape(-1)

    w_frames = jnp.clip(n - S + jnp.arange(S_slam), 0, state.tstamps.shape[0] - 1)
    win_tstamps = jnp.take(state.tstamps, w_frames)

    return TrackerInput(window_rgbd, queries, query_valid, n - S, win_tstamps)


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Quantile over masked elements (torch.quantile analogue with padding)."""
    vals = jnp.where(mask, x, jnp.nan)
    return jnp.nanquantile(vals.reshape(-1), q)


def gate_and_append(
    state: SLAMState,
    tin: TrackerInput,
    tout: TrackerOutput,
    n: jnp.ndarray,
    slot: jnp.ndarray,          # () ring slot for this append
    dims: StaticDims,
    *,
    vis_threshold: float,
    static_threshold: float,
    static_quantile: float,
    min_track_len: int,
    boundary_padding: int = 20,
) -> SLAMState:
    """Gate tracker outputs into weights and write one ring-slot of edges.

    Follows predict_target (batrack.py:760-805) + update_local (:632-663).
    """
    S_slam, M, kf, n_src, S_local = (
        dims.S_slam, dims.M, dims.kf_stride, dims.n_src, dims.S_local,
    )
    S = jnp.minimum(n, S_slam)
    wd, ht = dims.wd, dims.ht
    NQ = n_src * M

    # overwrite predictions at the query's own time with the query itself
    # (_compute_sparse_tracks :575-582)
    sid = tin.queries[:, 0].astype(jnp.int32)            # (NQ,)
    onehot = jax.nn.one_hot(sid, S_slam, axis=0, dtype=jnp.float32)  # (S, NQ)
    # sanitize non-finite tracker outputs: gates treat them as invisible and
    # nan_to_num keeps the stored targets from poisoning later masked math
    finite = (
        jnp.isfinite(tout.tracks).all(-1)
        & jnp.isfinite(tout.depths)
        & jnp.isfinite(tout.vis)
    )
    tracks = jnp.where(onehot[..., None] > 0, tin.queries[None, :, 1:3],
                       jnp.nan_to_num(tout.tracks, nan=-1e4, posinf=1e4, neginf=-1e4))
    vis = jnp.where(onehot > 0, 1.0,
                    jnp.where(finite, jnp.nan_to_num(tout.vis), 0.0))
    depths = jnp.nan_to_num(tout.depths, nan=1e-2, posinf=1e2, neginf=1e-2)

    frame_live = (jnp.arange(S_slam) < S)[:, None]        # (S, 1) real frames
    q_live = tin.query_valid[None, :]                     # (1, NQ)
    live = frame_live & q_live

    # gates (get_window_trajs :707-721, predict_target :769-792)
    vis_label = vis > vis_threshold
    boundary = (
        (tracks[..., 0] >= boundary_padding)
        & (tracks[..., 0] < wd - boundary_padding)
        & (tracks[..., 1] >= boundary_padding)
        & (tracks[..., 1] < ht - boundary_padding)
    )
    vis_raw = vis_label & boundary & live

    static_e = 1.0 - jnp.nan_to_num(tout.dynamic, nan=1.0)
    static_th = masked_quantile(static_e, live, 1.0 - static_quantile)
    static_th = jnp.minimum(static_th, static_threshold)
    static_label = (static_e >= static_th) & live

    disp = 1.0 / jnp.maximum(depths, 1e-2)
    target_3d = jnp.concatenate([tracks, disp[..., None]], axis=-1)  # (S, NQ, 3)

    weight = vis_raw.astype(jnp.float32)                              # (S, NQ)

    # track-length gate (predict_target :779-786); also writes patches_valid
    track_len = (weight > 0).sum(axis=0)                              # (NQ,)
    long_enough = track_len >= min_track_len
    apply_len = n >= min_track_len
    weight = jnp.where(apply_len, weight * long_enough[None, :], weight)

    weight_pose = weight * static_label.astype(jnp.float32)

    # patches_valid for query frames := track-length result (:783)
    q_rows = jnp.where(
        tin.query_valid,
        (tin.win_start + sid).astype(jnp.int32) * M + jnp.tile(jnp.arange(M), n_src),
        state.patches_valid.shape[0],
    )
    patches_valid = jnp.where(
        apply_len,
        state.patches_valid.at[q_rows].set(
            long_enough.astype(jnp.float32), mode="drop"
        ),
        state.patches_valid,
    )

    # ---- factor-graph append (__edges :399-410 + predict_target :795-798)
    # edge grid (qs, m, s): ii = win_start + qs*kf, jj = win_start + s
    q_frame = (tin.win_start + jnp.arange(n_src) * kf).astype(jnp.int32)
    ii = jnp.broadcast_to(q_frame[:, None, None], (n_src, M, S_slam))
    jj = jnp.broadcast_to(
        (tin.win_start + jnp.arange(S_slam)).astype(jnp.int32)[None, None, :],
        (n_src, M, S_slam),
    )
    kk = ii * M + jnp.broadcast_to(jnp.arange(M)[None, :, None], (n_src, M, S_slam))

    # tracker arrays are (S, NQ=(qs m)); transpose to (qs, m, s)
    def to_edge(x):  # (S, NQ, ...) -> (n_src, M, S_slam, ...)
        x = jnp.moveaxis(x, 0, 1)  # (NQ, S, ...)
        return x.reshape((n_src, M, S_slam) + x.shape[2:])

    e_target = to_edge(target_3d).reshape(-1, 3)
    e_w = to_edge(weight).reshape(-1)
    e_wp = to_edge(weight_pose).reshape(-1)
    e_st = to_edge(static_label.astype(jnp.float32)).reshape(-1)
    e_valid = to_edge(live.astype(jnp.float32)).reshape(-1)

    eps = dims.edges_per_slot
    base = slot * eps
    rows = base + jnp.arange(eps)
    state = state._replace(
        e_kk=state.e_kk.at[rows].set(kk.reshape(-1)),
        e_jj=state.e_jj.at[rows].set(jj.reshape(-1)),
        e_target=state.e_target.at[rows].set(e_target),
        e_weight=state.e_weight.at[rows].set(
            jnp.broadcast_to(e_w[:, None], (eps, 2))
        ),
        e_weight_pose=state.e_weight_pose.at[rows].set(
            jnp.broadcast_to(e_wp[:, None], (eps, 2))
        ),
        e_valid=state.e_valid.at[rows].set(e_valid),
        e_static=state.e_static.at[rows].set(e_st),
        slot_start=state.slot_start.at[slot].set(tin.win_start.astype(jnp.int32)),
        patches_valid=patches_valid,
    )

    # ---- local trajectory buffers (update_local :632-663)
    mid = (S_local + 1) // 2 - 1
    local_id = jj - ii + mid                                # (n_src, M, S_slam)
    # validity: in-range local id AND a live edge
    lid_ok = (local_id >= 0) & (local_id < S_local) & (e_valid.reshape(n_src, M, S_slam) > 0)

    kk_f = jnp.where(lid_ok, kk, state.local_targets.shape[0]).reshape(-1)
    lid_f = jnp.clip(local_id, 0, S_local - 1).reshape(-1)

    vis_e_edge = to_edge(vis_raw.astype(jnp.float32)).reshape(-1)
    static_e_edge = e_st

    state = state._replace(
        local_targets=state.local_targets.at[kk_f, lid_f].set(e_target, mode="drop"),
        local_vis=state.local_vis.at[kk_f, lid_f].set(vis_e_edge, mode="drop"),
        local_static=state.local_static.at[kk_f, lid_f].set(static_e_edge, mode="drop"),
        local_weights=state.local_weights.at[kk_f, lid_f].set(e_w, mode="drop"),
    )
    return state
