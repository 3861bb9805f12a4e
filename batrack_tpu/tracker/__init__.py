"""Motion-decoupled point tracker (MDTracker) in Flax, TPU-native.

Rebuild of main/frontend/md_tracker.py with fused correlation sampling and
static-shape sliding windows; weight-compatible with the released torch
checkpoint via tracker.convert.
"""

from batrack_tpu.tracker.adapter import MDTrackerAdapter
from batrack_tpu.tracker.convert import convert_state_dict, load_checkpoint
from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams

__all__ = [
    "MDTracker",
    "TrackerParams",
    "MDTrackerAdapter",
    "convert_state_dict",
    "load_checkpoint",
]
