"""SLAM state checkpoint / resume.

The reference has no mid-run state persistence (SURVEY.md §5: stage-level
filesystem handoff only); here the full static-shape SLAM state plus the
host-side bookkeeping serialize to one .npz, so a live run can stop and
resume mid-sequence — useful for long sequences and fault recovery.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import jax.numpy as jnp
import numpy as np

from batrack_tpu.slam.state import SLAMState

if TYPE_CHECKING:
    from batrack_tpu.slam.system import BATrack


def save_slam_state(slam: "BATrack", path: str) -> None:
    arrays = {f"state_{k}": np.asarray(v) for k, v in slam.state._asdict().items()}
    meta = {
        "n": slam.n,
        "counter": slam.counter,
        "append_count": slam.append_count,
        "is_initialized": slam.is_initialized,
        "tlist": [float(t) for t in slam.tlist],
        "delta": {
            str(t1): [int(t0), np.asarray(dP).tolist()]
            for t1, (t0, dP) in slam.delta.items()
        },
        "slot_info": [
            None if info is None
            else [int(info["seq"]), [int(s) for s in info["sources"]]]
            for info in slam._slot_info
        ],
    }
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _ring_pad(k: str, arr: np.ndarray, cur, slot_unit: int, ring_saved: int):
    """Migrate a smaller saved edge-ring field to the configured capacity.

    The ring capacity grew with use_keyframe (+KEYFRAME_RING_EXTRA,
    state.py::ring_slots_for), so checkpoints saved under an older/smaller
    ring are padded with empty slots (e_valid 0, slot_start -1, data 0) —
    appended slots sit AFTER the saved ones, so saved slot indices (and the
    restored _slot_info entries) remain valid. Only the leading (slot/edge)
    axis may differ, and only by whole slots of the CURRENT per-slot layout:
    the saved element count must equal ring_saved (the saved slot_start
    length) times the current slot_unit, which rejects checkpoints saved
    under a different kf_stride/S_slam/M whose identical byte count would
    otherwise be silently reinterpreted with the wrong slot grouping.
    Anything else is a genuine config mismatch and still raises."""
    cshape = cur.shape
    if (
        arr.shape[1:] != tuple(cshape[1:])
        or arr.shape[0] >= cshape[0]
        or arr.shape[0] != ring_saved * slot_unit
        or cshape[0] % slot_unit
    ):
        return None
    fill = -1 if k == "slot_start" else 0
    pad = np.full((cshape[0] - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def load_slam_state(slam: "BATrack", path: str) -> None:
    data = np.load(path, allow_pickle=False)
    fields = {}
    ring_fields = {"e_kk", "e_jj", "e_target", "e_weight", "e_weight_pose",
                   "e_valid", "e_static", "slot_start"}
    edges_per_slot = slam.dims.edges_per_slot
    ring_saved = int(data["state_slot_start"].shape[0])
    for k in SLAMState._fields:
        arr = data[f"state_{k}"]
        cur = getattr(slam.state, k)
        if arr.shape != cur.shape:
            migrated = None
            if k in ring_fields:
                unit = 1 if k == "slot_start" else edges_per_slot
                migrated = _ring_pad(k, arr, cur, unit, ring_saved)
            if migrated is None:
                hint = ""
                if k in ring_fields:
                    # edge-ring capacity depends on REMOVAL_WINDOW/kf_stride
                    # AND on use_keyframe (+KEYFRAME_RING_EXTRA, state.py::
                    # ring_slots_for) — the usual cause of this mismatch.
                    # A SMALLER saved ring is auto-migrated above; only
                    # larger-than-configured or non-slot-aligned shapes land
                    # here
                    hint = (
                        " (edge-ring capacity differs: it is set by "
                        "REMOVAL_WINDOW/kf_stride and, when use_keyframe is "
                        "on, +KEYFRAME_RING_EXTRA — load with the same slam "
                        "config the checkpoint was saved under)"
                    )
                raise ValueError(
                    f"checkpoint field {k} shape {arr.shape} != config shape "
                    f"{cur.shape}{hint}"
                )
            arr = migrated
        fields[k] = jnp.asarray(arr)
    slam.state = SLAMState(**fields)
    if slam.mesh is not None:
        # resuming under a multi-process mesh: re-promote to global arrays
        # (every process loads the same checkpoint; no-op single-process)
        from batrack_tpu.parallel.mesh import replicate_pytree_for_mesh

        slam.state = replicate_pytree_for_mesh(slam.state, slam.mesh)
    meta = json.loads(str(data["meta"]))
    slam.n = int(meta["n"])
    slam.counter = int(meta["counter"])
    slam.append_count = int(meta["append_count"])
    slam.is_initialized = bool(meta["is_initialized"])
    slam.tlist = list(meta["tlist"])
    slam.delta = {
        int(t1): (int(v[0]), np.asarray(v[1], np.float32))
        for t1, v in meta["delta"].items()
    }
    # older checkpoints predate the slot allocator: reconstruct the
    # round-robin state they were written under (equivalent when no
    # keyframe removal was in flight). The round-robin modulus is the
    # SAVED ring size — after a ring migration the arrays still hold
    # append seq at slot (seq % ring_saved), not (seq % R)
    slot_info = meta.get("slot_info")
    R = len(slam._slot_info)
    if slot_info is None:
        slam._slot_info = [None] * R
        for seq in range(max(0, slam.append_count - ring_saved),
                         slam.append_count):
            slam._slot_info[seq % ring_saved] = {
                "seq": seq,
                "sources": [],  # unknown; treated as dead (pre-allocator FIFO)
            }
    else:
        restored = [
            None if v is None else {"seq": v[0], "sources": list(v[1])}
            for v in slot_info
        ]
        # ring migration (see _ring_pad): appended empty slots follow the
        # saved ones, so the saved allocator entries map index-for-index
        slam._slot_info = restored + [None] * (R - len(restored))
