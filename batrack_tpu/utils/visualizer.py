"""Track-overlay visualization: per-frame track drawing + mp4 export.

Capability mirror of main/slam_visualizer.py (SLAMVisualizer/LEAPVisualizer):
collects frames and per-step track predictions from the SLAM loop, draws
tracked points with fading trace lines colored by visibility/static labels,
and writes an mp4 (cv2.VideoWriter here; the reference uses moviepy, which is
not available in this environment).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def _colormap_rainbow(n: int) -> np.ndarray:
    """n RGB colors around the hue wheel (the reference's 'rainbow' mode)."""
    import colorsys

    return np.array(
        [colorsys.hsv_to_rgb(i / max(n, 1), 0.9, 1.0) for i in range(n)]
    ) * 255.0


class TrackVisualizer:
    """Collects frames + track predictions; renders overlay video.

    add_track expects the dict produced by the SLAM frontend per append:
      {fid, targets (S, n_src, M, 2), weights (S, n_src, M), vis (S, NQ),
       static (S, NQ)} — arrays are converted lazily so the hot loop never
    blocks on device transfers.
    """

    def __init__(
        self,
        save_dir: str = "./results",
        fps: int = 10,
        linewidth: int = 2,
        tracks_leave_trace: int = 8,
        mode: str = "rainbow",
    ):
        self.save_dir = save_dir
        self.fps = fps
        self.linewidth = linewidth
        self.trace = tracks_leave_trace
        self.mode = mode
        self.frames: List[np.ndarray] = []
        self.tracks: List[Dict] = []

    def add_frame(self, frame) -> None:
        self.frames.append(frame)

    def add_track(self, track: Dict) -> None:
        self.tracks.append(track)

    # ------------------------------------------------------------------
    def draw_tracks_on_frames(self) -> List[np.ndarray]:
        """Overlay each append's tracks onto its window frames."""
        import cv2

        out = [np.ascontiguousarray(np.asarray(f, np.uint8)) for f in self.frames]
        for track in self.tracks:
            fid = int(track["fid"])
            targets = np.asarray(track["targets"], np.float32)   # (S, Q, 2)
            weights = np.asarray(track.get("weights", np.ones(targets.shape[:2])))
            static = track.get("static")
            static = None if static is None else np.asarray(static)
            S, Q = targets.shape[:2]
            colors = _colormap_rainbow(Q)
            first = fid - S
            for s in range(S):
                f_idx = first + s
                if not (0 <= f_idx < len(out)):
                    continue
                img = out[f_idx]
                for q in range(Q):
                    if weights[s, q] <= 0:
                        continue
                    x, y = targets[s, q]
                    if not (0 <= x < img.shape[1] and 0 <= y < img.shape[0]):
                        continue
                    if static is not None:
                        color = (0, 200, 0) if static[s, q] > 0.5 else (0, 0, 220)
                    else:
                        color = tuple(int(c) for c in colors[q])
                    cv2.circle(img, (int(x), int(y)), self.linewidth, color, -1)
                    # fading trace over previous window frames
                    for dt in range(1, min(self.trace, s) + 1):
                        x0, y0 = targets[s - dt, q]
                        x1, y1 = targets[s - dt + 1, q]
                        if weights[s - dt, q] <= 0:
                            break
                        cv2.line(
                            img, (int(x0), int(y0)), (int(x1), int(y1)),
                            color, max(1, self.linewidth // 2),
                        )
        return out

    def save_video(self, filename: str = "tracks") -> Optional[str]:
        """Render + write mp4; returns the path (None when no frames)."""
        if not self.frames:
            return None
        import cv2

        os.makedirs(self.save_dir, exist_ok=True)
        frames = self.draw_tracks_on_frames()
        h, w = frames[0].shape[:2]
        path = os.path.join(self.save_dir, f"{filename}.mp4")
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
        )
        for f in frames:
            writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        writer.release()
        return path


# ---------------------------------------------------------------------------
# Rerun 4D viewer (main/rerun_visualizer.py, vis_refined_results.py)
# ---------------------------------------------------------------------------

def generate_point_cloud(img, depth, intrinsics, cam_T_world, stride: int = 4):
    """Lift an RGB-D frame to a world point cloud (rerun_visualizer.py:84)."""
    H, W = depth.shape[:2]
    fx, fy, cx, cy = intrinsics
    u, v = np.meshgrid(np.arange(0, W, stride), np.arange(0, H, stride))
    d = depth[::stride, ::stride].reshape(-1)
    ok = d > 1e-3
    x = (u.reshape(-1) - cx) / fx * d
    y = (v.reshape(-1) - cy) / fy * d
    pts_cam = np.stack([x, y, d, np.ones_like(d)], -1)[ok]
    # results['cams_T_world'] already stores camera-to-world matrices
    # (system.py get_results: matrix(inv(w2c)); the reference applies them
    # directly, rerun_visualizer.py:75 `pts = pose @ pts`) — do NOT invert
    pts = (cam_T_world @ pts_cam.T).T[:, :3]
    colors = img[::stride, ::stride].reshape(-1, 3)[ok]
    return pts, colors


def vis_rerun(results: dict, stride: int = 4, app_name: str = "batrack_tpu") -> bool:
    """Log refined results to a Rerun viewer (graceful no-op without the SDK).

    Logs pinhole cameras, RGB images, refined point clouds and static(green)/
    dynamic(red) 2D tracks, mirroring rerun_visualizer.py:152-275.
    """
    try:
        import rerun as rr
    except ImportError:
        print("rerun-sdk not installed; skipping 4D visualization")
        return False

    rr.init(app_name, spawn=True)
    rgbs = np.asarray(results["rgbs"])
    dmaps = np.asarray(results.get("dmaps_scaled", results["dmaps"]))
    cams = np.asarray(results["cams_T_world"])
    intr = np.asarray(results["intrinsics"])
    trajs = results.get("trajs_2d_disp")
    static = results.get("trajs_static")

    for t in range(len(rgbs)):
        rr.set_time_sequence("frame", t)
        fx, fy, cx, cy = intr[t]
        # cams_T_world rows are already camera-to-world (see
        # generate_point_cloud; reference rerun_visualizer.py:201 uses them
        # directly as the camera transform)
        c2w = cams[t]
        rr.log(
            "world/camera",
            rr.Transform3D(translation=c2w[:3, 3], mat3x3=c2w[:3, :3]),
        )
        rr.log(
            "world/camera/image",
            rr.Pinhole(
                focal_length=[fx, fy], principal_point=[cx, cy],
                width=rgbs.shape[2], height=rgbs.shape[1],
            ),
        )
        rr.log("world/camera/image/rgb", rr.Image(rgbs[t].astype(np.uint8)))
        pts, colors = generate_point_cloud(
            rgbs[t], dmaps[t].squeeze(), intr[t], cams[t], stride
        )
        rr.log("world/points", rr.Points3D(pts, colors=colors.astype(np.uint8)))
        if trajs is not None:
            xy = np.asarray(trajs)[t, :, :, :2].reshape(-1, 2)
            if static is not None:
                st = np.asarray(static)[t].reshape(-1) > 0.5
                cols = np.where(st[:, None], [[0, 255, 0]], [[255, 0, 0]])
            else:
                cols = None
            rr.log("world/camera/image/tracks", rr.Points2D(xy, colors=cols))
    return True
