"""Depth-prior preparation (stage 1): alignment of relative to metric depth.

External depth networks (UniDepth / DepthAnything / ZoeDepth) are providers
of saved files; this package ingests and aligns them (SURVEY.md §7.7).
"""

from batrack_tpu.depth.align import (
    align_depth_dirs,
    align_depth_sequence,
    fit_frame_scale_shift,
    intrinsics_to_fov,
)

__all__ = [
    "align_depth_dirs",
    "align_depth_sequence",
    "fit_frame_scale_shift",
    "intrinsics_to_fov",
]
