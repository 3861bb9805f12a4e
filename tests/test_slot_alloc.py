"""Unit tests for the edge-ring slot allocator (slam/system.py::_alloc_slot).

The allocator exists because keyframe removal stalls the frame counter
while appends continue (batrack.py:990,1026-1073), so blind FIFO slot
reuse would overwrite edge blocks the reference still keeps (its prune is
`ix[kk] < n - REMOVAL_WINDOW`, batrack.py:1020-1024). These tests pin the
allocator's contract directly; the end-to-end behaviour is pinned by
tests/test_slam_ref_parity.py::test_keyframe_removal_matches_reference.
"""

import logging

import numpy as np
import pytest

from batrack_tpu.slam import BATrack
from batrack_tpu.slam.state import ring_slots_for
from batrack_tpu.utils.config import Config


def _slam(use_keyframe=False, removal_window=6):
    cfg = Config()
    s = cfg.slam
    s.BUFFER_SIZE = 64
    s.PATCHES_PER_FRAME = 4
    s.S_slam = 4
    s.kf_stride = 2
    s.REMOVAL_WINDOW = removal_window
    s.OPTIMIZATION_WINDOW = 5
    s.use_keyframe = use_keyframe
    s.KEYFRAME_RING_EXTRA = 2
    return BATrack(cfg, 32, 48, seed=0)


def test_ring_capacity_grows_under_keyframe():
    cfg = Config()
    cfg.slam.REMOVAL_WINDOW = 6
    cfg.slam.kf_stride = 2
    base = ring_slots_for(cfg.slam)
    cfg.slam.use_keyframe = True
    cfg.slam.KEYFRAME_RING_EXTRA = 2
    assert ring_slots_for(cfg.slam) == base + 2


def test_no_keyframe_reduces_to_round_robin():
    """Without removals, n advances kf_stride per append, so each slot is
    fully pruned by the time FIFO wraps back to it — the allocator must
    pick exactly the round-robin sequence the r3 code used."""
    slam = _slam(use_keyframe=False)
    R = slam.dims.ring_slots
    picks = []
    for i in range(3 * R):
        slam.n = 1 + i * slam.cfg.slam.kf_stride  # counter after ingest
        slam.append_count = i
        picks.append(slam._alloc_slot())
    assert picks == [i % R for i in range(3 * R)]


def test_live_slots_are_not_overwritten():
    """A slot whose sources are still inside the REMOVAL_WINDOW must not be
    reused while any dead/empty slot exists."""
    slam = _slam(use_keyframe=True)
    R = slam.dims.ring_slots
    slam.n = 20
    # slot 0: live (source 19 >= 20 - 6); slot 1: dead; others empty
    slam._slot_info[0] = {"seq": 0, "sources": [19]}
    slam._slot_info[1] = {"seq": 1, "sources": [2]}
    slam.append_count = 2
    pick = slam._alloc_slot()  # empty slots (seq -1) come before dead ones
    assert pick != 0 and pick in range(2, R)
    # fill everything live except slot 3 (dead)
    for i in range(R):
        slam._slot_info[i] = {"seq": i, "sources": [19]}
    slam._slot_info[3] = {"seq": 3, "sources": [1]}
    slam.append_count = R
    assert slam._alloc_slot() == 3


def test_over_capacity_overwrites_stalest_and_warns(caplog):
    slam = _slam(use_keyframe=True)
    R = slam.dims.ring_slots
    slam.n = 20
    for i in range(R):
        slam._slot_info[i] = {"seq": 10 + i, "sources": [19]}  # all live
    slam.append_count = 10 + R
    with caplog.at_level(logging.WARNING):
        pick = slam._alloc_slot()
    assert pick == 0  # stalest seq
    assert any("over capacity" in r.message for r in caplog.records)


def test_removal_updates_sources():
    """_keyframe's bookkeeping: removing buffer frame k drops k from every
    slot's source list and decrements sources above it (mirrors the
    reference's ii/jj decrement, batrack.py:1047-1049)."""
    slam = _slam(use_keyframe=True)
    slam._slot_info[0] = {"seq": 0, "sources": [3, 5, 7]}
    k = 5
    for info in slam._slot_info:
        if info is not None:
            info["sources"] = [s - (s > k) for s in info["sources"] if s != k]
    assert slam._slot_info[0]["sources"] == [3, 6]


def test_checkpoint_roundtrip_preserves_slot_info(tmp_path):
    slam = _slam(use_keyframe=True)
    slam._slot_info[0] = {"seq": 4, "sources": [7, 9]}
    slam._slot_info[2] = {"seq": 5, "sources": [11]}
    path = str(tmp_path / "ckpt.npz")
    slam.save_state(path)

    slam2 = _slam(use_keyframe=True)
    slam2.load_state(path)
    assert slam2._slot_info[0] == {"seq": 4, "sources": [7, 9]}
    assert slam2._slot_info[1] is None
    assert slam2._slot_info[2] == {"seq": 5, "sources": [11]}


def test_sources_match_tracker_window_queries():
    """The allocator's host-side source list must equal the query frames
    build_tracker_input derives on device (frontend.py:59-63)."""
    import jax.numpy as jnp

    from batrack_tpu.slam.frontend import build_tracker_input

    slam = _slam(use_keyframe=False)
    for n in (1, 2, 3, 5, 9):
        slam.n = n
        slam.append_count = 0
        slam._slot_info = [None] * slam.dims.ring_slots
        slam._alloc_slot()
        hosts = slam._slot_info[0]["sources"]
        tin = build_tracker_input(
            slam.state, jnp.asarray(n, jnp.int32), dims=slam.dims
        )
        S = min(n, slam.dims.S_slam)
        dev = [
            int(n - S + q * slam.dims.kf_stride)
            for q in range(slam.dims.n_src)
            if bool(tin.query_valid[q * slam.dims.M])
        ]
        assert hosts == dev, (n, hosts, dev)
