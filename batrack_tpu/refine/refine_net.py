"""Stage-3 dense global alignment: losses + state, pure JAX.

Rebuild of main/global_refine/model/refine_net.py:15-425. Differences from
the torch original, all TPU-motivated:

* Parameters are a plain pytree; poses are optimized in the tangent space
  (pose = Exp(delta) * pose_init) instead of pypose manifold Parameters.
* The (T, S, N, N) visibility/static/disparity pair masks that the reference
  materialises up front (refine_net.py:110-118, ~GBs at full size) are formed
  on the fly inside the rigidity loss, frame by frame under lax.map.
* The whole loss is one jitted function; the training loop is a jitted
  optax Adam step (see trainer.py).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.geometry import se3
from batrack_tpu.ops.sampling import bilinear_sample2d, interpolate_bilinear
from batrack_tpu.utils.config import RefineConfig

PW_BREAK = 20.0     # refine_net.py:38 (pw_break)
FRAME_SCALE_DIV = 10.0  # refine_net.py:139 (exp(x / 10))
K_SCALE = 20.0      # refine_net.py:19


def _abs0(x):
    """|x| with a ZERO subgradient at 0 (torch convention). jnp.abs
    backpropagates 1 at exactly 0, and the refine losses sit exactly on
    that point at init (all scales equal -> all pairwise differences 0),
    where Adam's first step is ~sign(g)*lr — the convention decides the
    sign of entire first updates (see tests/test_refine_ref_parity.py)."""
    return x * jnp.sign(x)


def _safe_norm(x, axis=-1):
    """L2 norm with a zero subgradient at 0 (torch convention; plain
    jnp.linalg.norm backpropagates NaN at exactly-zero distances, which the
    pairwise-distance diagonals always hit)."""
    ssq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(ssq + 1e-12)


class RefineData(NamedTuple):
    """Static observation tensors loaded from the SLAM results pickle."""

    trajs_2d: jnp.ndarray        # (T, N, S, 2)
    trajs_disp: jnp.ndarray      # (T, N, S) tracked disparity
    trajs_disp_mono: jnp.ndarray # (T, N, S) mono disparity sampled along tracks
    trajs_vis: jnp.ndarray       # (T, N, S)
    trajs_static: jnp.ndarray    # (T, N, S)
    query_frame_mask: jnp.ndarray  # (T,) 1.0 for frames in grid_query_frames
    jj: jnp.ndarray              # (T, S) neighbour frame ids (unclamped)
    pose_init: jnp.ndarray       # (T, 7) SE3 (from cams_T_world)
    intrinsics: jnp.ndarray      # (T, 4)
    dmaps: jnp.ndarray           # (T, H, W) depth maps (possibly pre-aligned)


class RefineParams(NamedTuple):
    trajs_scales: jnp.ndarray    # (T, N, S)
    frame_scales: jnp.ndarray    # (T, gh, gw) raw (exp applied)
    pose_delta: jnp.ndarray      # (T, 6) tangent update
    K: jnp.ndarray               # (4,) scaled by 1/K_SCALE


def align_depth_maps(depth_maps: np.ndarray) -> np.ndarray:
    """Sequential median-chain depth alignment (model/utils.py:268-313)."""
    S = depth_maps.shape[0]
    out = np.array(depth_maps, dtype=np.float64, copy=True)
    min_overlap = 100
    for i in range(1, S):
        D_prev = out[i - 1]
        D_curr = depth_maps[i]
        mask = (D_prev > 0) & (D_curr > 0)
        if mask.sum() < min_overlap:
            out[i] = D_curr
            continue
        if i == 1:
            median_prev = np.median(D_prev[mask])
        else:
            mask_past = (out[i - 2] > 0) & (D_prev > 0)
            median_prev = np.median(
                np.concatenate([out[i - 2][mask_past], D_prev[mask]])
            )
        scale = median_prev / np.median(D_curr[mask])
        out[i] = scale * D_curr
    return out.astype(depth_maps.dtype)


def build_refine_data(
    results: dict, align_depth: bool = True, dtype=np.float32
) -> RefineData:
    """From a results.pkl dict (reference schema, batrack.py:1113-1125).

    dtype: float32 in production; float64 for the reference-parity suite
    (tests/test_refine_ref_parity.py) where rounding must not mask a
    semantic difference.
    """
    trajs = np.asarray(results["trajs_2d_disp"], dtype)  # (T, N, S, 3)
    T, N, S, _ = trajs.shape
    dmaps = np.asarray(results["dmaps"], dtype)
    if dmaps.ndim == 4:
        dmaps = dmaps[..., 0]
    if align_depth:
        dmaps = align_depth_maps(dmaps)

    mid = S // 2
    jj = np.arange(T)[:, None] + np.arange(S)[None, :] - mid  # (T, S)

    # mono disparity along the 2D tracks (refine_net.py:95-108) — vectorized
    # numpy: this is one-off host-side prep, and device dispatch per frame
    # costs far more than the gather itself
    jj_c = np.clip(jj, 0, T - 1)                     # (T, S)
    Himg, Wimg = dmaps.shape[-2:]
    x = trajs[..., 0]                                # (T, N, S)
    y = trajs[..., 1]
    x0 = np.floor(x)
    y0 = np.floor(y)
    wx = x - x0
    wy = y - y0
    x0c = np.clip(x0, 0, Wimg - 1).astype(np.int64)
    x1c = np.clip(x0 + 1, 0, Wimg - 1).astype(np.int64)
    y0c = np.clip(y0, 0, Himg - 1).astype(np.int64)
    y1c = np.clip(y0 + 1, 0, Himg - 1).astype(np.int64)
    fsel = jj_c[:, None, :]                          # (T, 1, S) frame per tap
    d = (
        (1 - wy) * (1 - wx) * dmaps[fsel, y0c, x0c]
        + (1 - wy) * wx * dmaps[fsel, y0c, x1c]
        + wy * (1 - wx) * dmaps[fsel, y1c, x0c]
        + wy * wx * dmaps[fsel, y1c, x1c]
    )
    mono = (1.0 / np.maximum(d, 1e-2)).astype(dtype)

    qmask = np.zeros((T,), dtype)
    qmask[np.asarray(results["grid_query_frames"], int)] = 1.0

    cams = np.asarray(results["cams_T_world"], dtype)
    # tiny (T,4,4) conversion: run on the host CPU backend — compiling it on
    # a tunneled TPU costs ~13 s, on CPU <1 s
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        pose_init = np.asarray(se3.from_matrix(jnp.asarray(cams)))

    return RefineData(
        trajs_2d=jnp.asarray(trajs[..., :2]),
        trajs_disp=jnp.asarray(trajs[..., 2]),
        trajs_disp_mono=jnp.asarray(mono),
        trajs_vis=jnp.asarray(np.asarray(results["trajs_vis"], dtype)),
        trajs_static=jnp.asarray(np.asarray(results["trajs_static"], dtype)),
        query_frame_mask=jnp.asarray(qmask),
        jj=jnp.asarray(jj, jnp.int32),
        pose_init=jnp.asarray(pose_init),
        intrinsics=jnp.asarray(np.asarray(results["intrinsics"], dtype)),
        dmaps=jnp.asarray(dmaps),
    )


def init_params(
    data: RefineData, grid_size: int, dtype=jnp.float32
) -> RefineParams:
    T, N, S = data.trajs_disp.shape
    # both ones like the reference (refine_net.py:41-42). Note the frame
    # scales are NOT the identity at init: effective = exp(1/10) ~ 1.105
    # (trajs_scales ARE identity: mean-centering zeroes them before exp) —
    # reference-faithful, the optimizer removes the 10% bias
    return RefineParams(
        trajs_scales=jnp.ones((T, N, S), dtype),
        frame_scales=jnp.ones((T, grid_size, grid_size), dtype),
        pose_delta=jnp.zeros((T, 6), dtype),
        K=jnp.median(data.intrinsics, axis=0).astype(dtype) / K_SCALE,
    )


# ---------------------------------------------------------------------------
# derived quantities
# ---------------------------------------------------------------------------

def effective_trajs_scales(p: RefineParams) -> jnp.ndarray:
    """norm_pw_scale + exp (refine_net.py:121-126)."""
    s = p.trajs_scales - p.trajs_scales.mean(axis=1, keepdims=True)
    return jnp.exp(s / PW_BREAK)


def effective_frame_scales(p: RefineParams) -> jnp.ndarray:
    return jnp.exp(p.frame_scales / FRAME_SCALE_DIV)


def poses(p: RefineParams, data: RefineData) -> jnp.ndarray:
    return se3.mul(se3.exp(p.pose_delta), data.pose_init)


def intrinsics(p: RefineParams, data: RefineData, refine_K: bool) -> jnp.ndarray:
    if refine_K:
        return jnp.broadcast_to(p.K * K_SCALE, data.intrinsics.shape)
    return data.intrinsics


def frame_scaled_disp(
    p: RefineParams, data: RefineData, image_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Mono disparity x per-frame grid scale at track points
    (refine_net.py:148-174). Returns (T, N, S)."""
    fs = effective_frame_scales(p)  # (T, gh, gw)
    T, gh, gw = fs.shape
    H, W = image_hw
    jj_c = jnp.clip(data.jj, 0, T - 1)  # (T, S)

    # grid_sample(align_corners=True): pixel -> grid coords
    gx = data.trajs_2d[..., 0] * (gw - 1) / (W - 1)  # (T, N, S)
    gy = data.trajs_2d[..., 1] * (gh - 1) / (H - 1)

    def per_frame(args):
        sel, x, y = args  # (S,), (N, S), (N, S)
        maps = jnp.take(fs, sel, axis=0)[:, None]  # (S, 1, gh, gw)
        out = bilinear_sample2d(maps, x.T, y.T)[:, 0]  # (S, N)
        return out.T  # (N, S)

    scales_2d = jax.lax.map(per_frame, (jj_c, gx, gy))  # (T, N, S)
    return data.trajs_disp_mono * scales_2d


def scaled_dmaps(
    p: RefineParams, data: RefineData
) -> jnp.ndarray:
    """Refined dense depth: D / (scale_map + shift*D) with shift = 0
    (refine_net.py:408-416). Returns (T, H, W)."""
    fs = effective_frame_scales(p)[:, None]  # (T, 1, gh, gw)
    H, W = data.dmaps.shape[-2:]
    maps = interpolate_bilinear(fs, (H, W), align_corners=True)[:, 0]
    return data.dmaps / maps


def _iproj3(xy: jnp.ndarray, disp: jnp.ndarray, intr: jnp.ndarray) -> jnp.ndarray:
    """2D + disparity -> 3D (model/geomeotry.py:3-18)."""
    fx, fy, cx, cy = jnp.moveaxis(intr, -1, 0)
    depth = 1.0 / jnp.maximum(disp, 1e-2)
    xn = (xy[..., 0] - cx) / fx * depth
    yn = (xy[..., 1] - cy) / fy * depth
    return jnp.stack([xn, yn, depth], axis=-1)


# ---------------------------------------------------------------------------
# losses (refine_net.py:176-392)
# ---------------------------------------------------------------------------

def spatial_loss(p, data, image_hw) -> jnp.ndarray:
    """Huber between frame-scaled mono disp and track-scaled tracked disp,
    averaged over query frames (refine_net.py:252-268)."""
    T = data.trajs_disp.shape[0]
    scales = effective_trajs_scales(p)
    aligned = scales * data.trajs_disp
    mono_scaled = frame_scaled_disp(p, data, image_hw)

    vis = data.trajs_vis > 0.9
    in_range = (data.jj[:, None, :] >= 0) & (data.jj[:, None, :] < T)
    # reference-faithful quirk: the "flow" gate is the norm of the ABSOLUTE
    # pixel coordinates (refine_net.py:260 trajs_2d.norm(-1) > 5), not of a
    # displacement — it only drops points within 5 px of the image origin
    flow = jnp.linalg.norm(data.trajs_2d, axis=-1) > 5.0
    disp_ok = data.trajs_disp > 1e-2
    mask = (vis & in_range & flow & disp_ok).astype(jnp.float32)

    diff = mono_scaled - aligned
    a = jnp.abs(diff)
    huber = jnp.where(a < 1.0, 0.5 * diff * diff, a - 0.5)
    per_frame = (huber * mask).mean(axis=(1, 2))
    q = data.query_frame_mask
    return (per_frame * q).sum() / jnp.maximum(q.sum(), 1.0)


def inter_frame_loss(p, data, image_hw) -> jnp.ndarray:
    """Pairwise-distance rigidity on static tracks (refine_net.py:197-222)."""
    T, N, S = data.trajs_disp.shape
    mid = S // 2
    mono_scaled = frame_scaled_disp(p, data, image_hw)
    intr = data.intrinsics

    def per_frame(args):
        jj_t, xy_t, raw_mono_t, vis_t, st_t, mono_t = args
        jj_c = jnp.clip(jj_t, 0, T - 1)
        intr_t = jnp.take(intr, jj_c, axis=0)           # (S, 4)
        pts = _iproj3(
            jnp.moveaxis(xy_t, 0, 1), jnp.moveaxis(mono_t, 0, 1), intr_t[:, None]
        )  # (S, N, 3)
        pd = _safe_norm(pts[:, :, None] - pts[:, None, :])  # (S, N, N)
        diff = _abs0(pd - pd[mid])
        t_ok = ((jj_t >= 0) & (jj_t < T)).astype(jnp.float32)[:, None, None]
        vis_m = jnp.moveaxis(vis_t, 0, 1)               # (S, N)
        st_m = jnp.moveaxis(st_t, 0, 1)
        # the disparity mask comes from the RAW mono disparity, fixed at
        # init like the reference's precomputed trajs_disp_mono_mask_mat
        # (refine_net.py:116,216) — NOT the frame-scaled value, whose mask
        # would shift as the optimized scales move
        disp_m = (jnp.moveaxis(raw_mono_t, 0, 1) > 1e-2).astype(jnp.float32)
        pair = (
            (vis_m[:, :, None] * vis_m[:, None, :] > 0.5)
            & (st_m[:, :, None] * st_m[:, None, :] > 0.5)
            & (disp_m[:, :, None] * disp_m[:, None, :] > 0.5)
        ).astype(jnp.float32)
        return (diff * t_ok * pair).mean()

    vals = jax.lax.map(
        per_frame,
        (data.jj, data.trajs_2d, data.trajs_disp_mono, data.trajs_vis,
         data.trajs_static, mono_scaled),
    )
    q = data.query_frame_mask
    # reference sums masked per-frame maps then divides by #query frames and
    # takes the mean over entries; per-frame mean then query-average matches.
    return (vals * q).sum() / jnp.maximum(q.sum(), 1.0)


def inter_frame_loss_local(p, data, image_hw) -> jnp.ndarray:
    """Rigidity on track-scaled tracked disparity (refine_net.py:224-250).

    Deliberately NOT part of total_loss: the reference defines this method
    but never calls it in forward() (refine_net.py:252-292) — kept available
    with the same status."""
    scaled = effective_trajs_scales(p) * data.trajs_disp
    data_local = data._replace(trajs_disp_mono=scaled)
    # identical machinery with the scaled tracked disparity in place of the
    # frame-scaled mono disparity
    T, N, S = data.trajs_disp.shape
    ones = RefineParams(
        trajs_scales=jnp.zeros((T, N, S)),
        frame_scales=jnp.zeros_like(p.frame_scales),
        pose_delta=p.pose_delta,
        K=p.K,
    )
    return inter_frame_loss(ones, data_local, image_hw)


def pts_3d_loss(p, data, image_hw, refine_K) -> jnp.ndarray:
    """Cross-frame 3D consistency through the poses (refine_net.py:314-354)."""
    T, N, S = data.trajs_disp.shape
    mid = S // 2
    mono_scaled = frame_scaled_disp(p, data, image_hw)
    pose = poses(p, data)  # (T, 7) cams_T_world as SE3 (c2w loaded matrices)
    intr = intrinsics(p, data, refine_K)

    src_xy = data.trajs_2d[:, :, mid]      # (T, N, 2)
    src_disp = mono_scaled[:, :, mid]      # (T, N)
    pts_src = _iproj3(src_xy, src_disp, intr[:, None])  # (T, N, 3)

    jj_c = jnp.clip(data.jj, 0, T - 1)     # (T, S)
    pose_trg = jnp.take(pose, jj_c, axis=0)          # (T, S, 7)
    src2trg = se3.mul(se3.inv(pose_trg), pose[:, None])  # (T, S, 7)
    pts_from_src = se3.act(src2trg[:, :, None], pts_src[:, None])  # (T, S, N, 3)

    intr_trg = jnp.take(intr, jj_c, axis=0)          # (T, S, 4)
    pts_trg = _iproj3(
        jnp.moveaxis(data.trajs_2d, 1, 2),            # (T, S, N, 2)
        jnp.moveaxis(mono_scaled, 1, 2),
        intr_trg[:, :, None],
    )
    dist = _safe_norm(pts_from_src - pts_trg)  # (T, S, N)

    vis = jnp.moveaxis(data.trajs_vis, 1, 2) > 0.9
    in_range = ((data.jj >= 0) & (data.jj < T))[:, :, None]
    disp_ok = jnp.moveaxis(data.trajs_disp, 1, 2) > 1e-2
    static = jnp.moveaxis(data.trajs_static, 1, 2) > 0.3
    mask = (vis & in_range & disp_ok & static).astype(jnp.float32)
    return (dist * mask).mean()


def cam_smooth_loss(p, data) -> jnp.ndarray:
    """Adjacent-pose smoothness on the 7-vector (refine_net.py:356-360)."""
    pose = poses(p, data)
    dt = _safe_norm(pose[:-1, :3] - pose[1:, :3])
    dq = _safe_norm(pose[:-1, 3:] - pose[1:, 3:])
    return dt.mean() + 0.3 * dq.mean()


def scale_smoothness_loss(p) -> jnp.ndarray:
    """L1 neighbour smoothness of the scale grid (refine_net.py:362-392)."""
    s = effective_frame_scales(p)
    return _abs0(s[:, :, :-1] - s[:, :, 1:]).mean() + _abs0(
        s[:, :-1] - s[:, 1:]
    ).mean()


def total_loss(
    p: RefineParams,
    data: RefineData,
    image_hw: Tuple[int, int],
    cfg: RefineConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Weighted sum with the CLI's default weights (run_global_refine.py:61-67)."""
    parts = {}
    if cfg.spatial_loss:
        parts["spatial_loss"] = cfg.spatial_loss * spatial_loss(p, data, image_hw)
    if cfg.inter_frame_loss:
        parts["inter_frame_loss"] = cfg.inter_frame_loss * inter_frame_loss(
            p, data, image_hw
        )
    if cfg.pts_3d_loss:
        parts["pts_3d_loss"] = cfg.pts_3d_loss * pts_3d_loss(
            p, data, image_hw, not cfg.fixed_K
        )
    if cfg.cam_smooth_vec_loss:
        parts["cam_smooth_vec_loss"] = cfg.cam_smooth_vec_loss * cam_smooth_loss(
            p, data
        )
    if cfg.scale_smoothness_loss:
        parts["scale_smoothness_loss"] = cfg.scale_smoothness_loss * (
            scale_smoothness_loss(p)
        )
    total = sum(parts.values())
    return total, parts


def get_results(
    p: RefineParams, data: RefineData, results: dict, refine_K: bool
) -> dict:
    """Refined results dict (refine_net.py:394-404 schema)."""
    out = dict(results)
    out["final_trajs_2d"] = np.asarray(data.trajs_2d)
    out["dmaps"] = np.asarray(data.dmaps)[..., None]
    out["dmaps_scaled"] = np.asarray(scaled_dmaps(p, data))[..., None]
    out["cams_T_world"] = np.asarray(se3.matrix(poses(p, data)))
    out["intrinsics"] = np.asarray(intrinsics(p, data, refine_K))
    return out
