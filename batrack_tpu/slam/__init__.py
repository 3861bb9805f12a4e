"""Online SLAM core: static-shape state machine + jitted frontend/backend.

TPU-native rebuild of the reference BATRACK class (main/batrack.py).
"""

from batrack_tpu.slam.frontend import TrackerInput, TrackerOutput
from batrack_tpu.slam.oracle import OracleTracker
from batrack_tpu.slam.state import SLAMState, StaticDims, init_state
from batrack_tpu.slam.system import BATrack

__all__ = [
    "BATrack",
    "SLAMState",
    "StaticDims",
    "init_state",
    "TrackerInput",
    "TrackerOutput",
    "OracleTracker",
]
