"""SLAM state: one static-shape pytree.

The reference preallocates ring buffers as CUDA tensors and mutates them
in-place (main/batrack.py:71-121); here the same buffers are a NamedTuple of
device arrays threaded functionally through jitted steps — static shapes mean
XLA compiles each step exactly once for a given configuration.

The factor graph is a ring of `RING_SLOTS` fixed-size edge blocks: one block
per tracker append (batrack.py:189-204). A block written REMOVAL_WINDOW
frames ago is overwritten by the new append; finer-grained removal
(keyframe_simple, batrack.py:1020-1024: drop edges whose patch frame left the
removal window) happens implicitly in the BA via the patch-window predicate,
so no compaction ever runs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from batrack_tpu.utils.config import Config


class SLAMState(NamedTuple):
    # per-frame buffers (N = BUFFER_SIZE)
    tstamps: jnp.ndarray         # (N,) int32 global frame counter per slot
    poses: jnp.ndarray           # (N, 7) SE3 world-to-camera
    intrinsics: jnp.ndarray      # (N, 4)

    # per-patch buffers (N*M rows)
    patches: jnp.ndarray         # (N*M, 3) [x, y, disp]
    patches_valid: jnp.ndarray   # (N*M,)
    colors: jnp.ndarray          # (N*M, 3) uint8

    # per-patch local-trajectory buffers (S_local = 2*S_slam - 1)
    local_targets: jnp.ndarray   # (N*M, S_local, 3) [x, y, disp] ("patches_local")
    local_vis: jnp.ndarray       # (N*M, S_local)
    local_static: jnp.ndarray    # (N*M, S_local) init ones
    local_weights: jnp.ndarray   # (N*M, S_local)
    trajs_world: jnp.ndarray     # (N*M, S_local, 3)

    # factor-graph edge ring (E_CAP = RING_SLOTS * EDGES_PER_SLOT)
    e_kk: jnp.ndarray            # (E_CAP,) patch id
    e_jj: jnp.ndarray            # (E_CAP,) target frame
    e_target: jnp.ndarray        # (E_CAP, 3) tracked [x, y, disp]
    e_weight: jnp.ndarray        # (E_CAP, 2) structure weights
    e_weight_pose: jnp.ndarray   # (E_CAP, 2) pose (static-only) weights
    e_valid: jnp.ndarray         # (E_CAP,)
    e_static: jnp.ndarray        # (E_CAP,) static label per edge (visualizer feed)
    slot_start: jnp.ndarray      # (RING_SLOTS,) window-start frame per slot; -1 empty

    # rolling local window of raw frames (S_slam newest frames)
    win_images: jnp.ndarray      # (S_slam, H, W, 3) float32 (0..255)
    win_depths: jnp.ndarray      # (S_slam, H, W) float32


def ring_slots_for(slam) -> int:
    """Edge-ring capacity in append blocks.

    Without keyframe removal, n advances kf_stride per append, so a block's
    sources leave the REMOVAL_WINDOW after REMOVAL_WINDOW/kf_stride turns.
    With use_keyframe, removals stall n while appends continue (one per
    frame during a pause, batrack.py:990,1026-1073) — each in-flight removal
    keeps one extra append block live, so reserve KEYFRAME_RING_EXTRA more.
    """
    base = slam.REMOVAL_WINDOW // slam.kf_stride
    if getattr(slam, "use_keyframe", False):
        return base + getattr(slam, "KEYFRAME_RING_EXTRA", 8)
    return base


def init_state(cfg: Config, ht: int, wd: int) -> SLAMState:
    slam = cfg.slam
    N, M = slam.BUFFER_SIZE, slam.PATCHES_PER_FRAME
    S_local = slam.S_local
    ring = ring_slots_for(slam)
    edges_per_slot = (slam.S_slam // slam.kf_stride) * M * slam.S_slam
    E = ring * edges_per_slot

    f32 = jnp.float32
    poses = jnp.zeros((N, 7), f32).at[:, 6].set(1.0)
    return SLAMState(
        tstamps=jnp.zeros((N,), jnp.int32),
        poses=poses,
        intrinsics=jnp.zeros((N, 4), f32),
        patches=jnp.zeros((N * M, 3), f32),
        patches_valid=jnp.zeros((N * M,), f32),
        colors=jnp.zeros((N * M, 3), jnp.uint8),
        local_targets=jnp.zeros((N * M, S_local, 3), f32),
        local_vis=jnp.zeros((N * M, S_local), f32),
        local_static=jnp.ones((N * M, S_local), f32),
        local_weights=jnp.zeros((N * M, S_local), f32),
        trajs_world=jnp.zeros((N * M, S_local, 3), f32),
        e_kk=jnp.zeros((E,), jnp.int32),
        e_jj=jnp.zeros((E,), jnp.int32),
        e_target=jnp.zeros((E, 3), f32),
        e_weight=jnp.zeros((E, 2), f32),
        e_weight_pose=jnp.zeros((E, 2), f32),
        e_valid=jnp.zeros((E,), f32),
        e_static=jnp.zeros((E,), f32),
        slot_start=jnp.full((ring,), -1, jnp.int32),
        win_images=jnp.zeros((slam.S_slam, ht, wd, 3), f32),
        win_depths=jnp.zeros((slam.S_slam, ht, wd), f32),
    )


class StaticDims(NamedTuple):
    """Compile-time constants derived from the config."""

    N: int
    M: int
    S_slam: int
    S_local: int
    kf_stride: int
    ring_slots: int
    edges_per_slot: int
    n_src: int          # query source slots per append = S_slam // kf_stride
    window: int         # BA pose window
    patch_window: int   # BA patch window (frames)
    ht: int
    wd: int

    @classmethod
    def from_config(cls, cfg: Config, ht: int, wd: int) -> "StaticDims":
        slam = cfg.slam
        n_src = slam.S_slam // slam.kf_stride
        return cls(
            N=slam.BUFFER_SIZE,
            M=slam.PATCHES_PER_FRAME,
            S_slam=slam.S_slam,
            S_local=slam.S_local,
            kf_stride=slam.kf_stride,
            ring_slots=ring_slots_for(slam),
            edges_per_slot=n_src * slam.PATCHES_PER_FRAME * slam.S_slam,
            n_src=n_src,
            window=max(slam.OPTIMIZATION_WINDOW, slam.num_init) + 1,
            patch_window=slam.REMOVAL_WINDOW,
            ht=ht,
            wd=wd,
        )
