"""BATrack SLAM system: the host-side orchestrator.

The per-frame loop stays in Python (it drives IO and the tracker), but every
tensor-touching stage is one of three jitted programs closed over the static
dims: ingest (window roll + patch gen + motion model), gate_and_append
(tracker gating + factor-graph ring write) and slam_update (full dual-BA
backend). Equivalent surface to the reference class BATRACK
(main/batrack.py:38-1135).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from batrack_tpu.geometry import se3
from batrack_tpu.slam.frontend import (
    TrackerInput,
    TrackerOutput,
    build_tracker_input,
    gate_and_append,
)
from batrack_tpu.slam.ingest import ingest_frame
from batrack_tpu.slam.state import SLAMState, StaticDims, init_state
from batrack_tpu.slam.update import slam_update
from batrack_tpu.utils.config import Config

# Tracker: (TrackerInput) -> TrackerOutput. May or may not be jitted inside.
TrackerFn = Callable[[TrackerInput], TrackerOutput]


class BATrack:
    """Online dynamic-scene visual odometry (reference BATRACK equivalent)."""

    def __init__(
        self,
        cfg: Config,
        ht: int,
        wd: int,
        tracker: Optional[TrackerFn] = None,
        seed: int = 0,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — when set, the backend update
        runs patch-sharded over it (parallel/sharded_slot_ba.py; the flat
        edge-sharded solver when use_keyframe forces the flat backend) and a
        mesh-aware tracker adapter shards the query axis. Single-device
        behaviour is unchanged when None."""
        self.cfg = cfg
        self.mesh = mesh
        self.dims = StaticDims.from_config(cfg, ht, wd)
        self.state = init_state(cfg, ht, wd)
        if mesh is not None:
            # multi-process mesh: promote the state to global replicated
            # arrays once (no-op on single-process meshes) — the full loop
            # then runs SPMD across hosts (tests/test_multihost.py)
            from batrack_tpu.parallel.mesh import replicate_pytree_for_mesh

            self.state = replicate_pytree_for_mesh(self.state, mesh)
        self.tracker = tracker
        self.key = jax.random.PRNGKey(seed)
        self._np_rng = np.random.default_rng(seed)  # host-side (sift patch gen)

        self.n = 0               # frames in buffer
        self.counter = 0         # total frames seen
        self.append_count = 0    # ring appends so far
        # per-ring-slot host bookkeeping: (append seq, live source frames).
        # The reference keeps an edge block until ALL its source frames fall
        # behind n - REMOVAL_WINDOW (batrack.py:1020-1024); under keyframe
        # removal n stalls while appends continue, so blind FIFO reuse would
        # overwrite blocks the reference still optimizes over. The allocator
        # only reuses dead (fully-pruned) or empty slots, FIFO among them —
        # which reduces exactly to round-robin when use_keyframe is off.
        self._slot_info: List[Optional[dict]] = [
            None for _ in range(self.dims.ring_slots)
        ]
        self.is_initialized = False
        self.tlist: List = []
        self.delta: Dict[int, Tuple[int, np.ndarray]] = {}  # keyframe removals
        self.ring_overflow_count = 0  # over-capacity slot overwrites (see _alloc_slot)
        self.visualizer = None   # optional TrackVisualizer
        self._last_append_n = None  # for cross-append tracker fmap reuse
        from batrack_tpu.utils.profiling import StageTimer

        self.timer = StageTimer(enabled=False)
        # when True, each timed stage fetches a scalar from its output so the
        # StageTimer reads device time, not dispatch time (the tunneled TPU
        # executes asynchronously even through block_until_ready). Serialises
        # the pipeline — enable only for profiling, never in production.
        self.sync_stages = False

        slam = cfg.slam
        dims = self.dims

        # state (arg 0) is donated in every state->state stage: the caller
        # always replaces self.state with the output, and donation lets XLA
        # update the ~300 MB of ring buffers in place instead of copying
        self._ingest_fn = functools.partial(
            ingest_frame,
            dims=dims,
            patch_gen=slam.PATCH_GEN,
            motion_damping=slam.MOTION_DAMPING,
        )
        self._ingest = jax.jit(self._ingest_fn, donate_argnums=(0,))
        self._build_input = jax.jit(
            functools.partial(build_tracker_input, dims=dims)
        )
        self._gate_append = jax.jit(
            functools.partial(
                gate_and_append,
                dims=dims,
                vis_threshold=slam.VIS_THRESHOLD,
                static_threshold=slam.STATIC_THRESHOLD,
                static_quantile=slam.STATIC_QUANTILE,
                min_track_len=slam.MIN_TRACK_LEN,
                boundary_padding=slam.BOUNDARY_PADDING,
            ),
            donate_argnums=(0,),
        )
        if (slam.use_keyframe and slam.kf_stride > 1
                and slam.KEYFRAME_INDEX % slam.kf_stride != 1):
            # removal candidates k = n - KEYFRAME_INDEX are evaluated only on
            # append frames (n == 1 mod kf_stride), and _keyframe requires
            # k == 0 mod kf_stride — both hold only when
            # KEYFRAME_INDEX == 1 mod kf_stride; otherwise removal silently
            # never fires. The reference has the identical parity trap
            # (batrack.py:1002-1031, 1029-1031); warn, don't change behavior.
            import logging

            logging.getLogger(__name__).warning(
                "use_keyframe with KEYFRAME_INDEX=%d, kf_stride=%d: keyframe "
                "removal can never trigger (needs KEYFRAME_INDEX == 1 mod "
                "kf_stride; reference-identical parity constraint)",
                slam.KEYFRAME_INDEX, slam.kf_stride,
            )
        if slam.use_keyframe and slam.BA_BACKEND == "slot":
            # frame deletion breaks dense slot addressing; use the flat solver
            import dataclasses
            import logging

            logging.getLogger(__name__).warning(
                "BA_BACKEND='slot' is incompatible with use_keyframe (frame "
                "deletion breaks dense slot addressing); falling back to the "
                "flat edge solver — expect lower BA throughput"
            )
            slam = dataclasses.replace(slam, BA_BACKEND="flat")
            self.cfg.slam = slam
        if mesh is not None and slam.BA_BACKEND == "slot":
            from batrack_tpu.parallel.sharded_slot_ba import (
                sharded_slot_slam_update,
            )

            update_fn = functools.partial(
                sharded_slot_slam_update, dims=dims, cfg=slam, mesh=mesh
            )
        elif mesh is not None:
            from batrack_tpu.parallel.sharded_ba import sharded_slam_update
            from batrack_tpu.parallel.sharded_slot_ba import full_axis

            update_fn = functools.partial(
                sharded_slam_update, dims=dims, cfg=slam, mesh=mesh,
                axis=full_axis(mesh),
            )
        else:
            update_fn = functools.partial(slam_update, dims=dims, cfg=slam)
        self._update = jax.jit(update_fn, donate_argnums=(0,))

        # fused ingest+update: non-append steady-state frames are one
        # dispatch instead of two (per-call latency is a first-order cost
        # both through the tunnel and at production frame rates)
        def _iu(state, image, depth, intr, n, counter, key, mark_valid,
                coords_override):
            state, _ = self._ingest_fn(
                state, image, depth, intr, n, counter, key,
                mark_valid=mark_valid, coords_override=coords_override,
            )
            return update_fn(state, n + 1, jnp.asarray(True))

        self._fused_ingest_update = jax.jit(_iu, donate_argnums=(0,))
        self._fused_append = None  # built lazily (needs the tracker)
        if slam.use_keyframe:
            from batrack_tpu.slam.keyframe import (
                motion_magnitude_pair,
                remove_keyframe,
                remove_window_frame,
            )

            self._motionmag_pair = jax.jit(
                functools.partial(motion_magnitude_pair, dims=dims)
            )
            self._remove_kf = jax.jit(
                functools.partial(remove_keyframe, dims=dims),
                donate_argnums=(0,),
            )
            self._remove_win = jax.jit(
                functools.partial(remove_window_frame, dims=dims)
            )

    # ------------------------------------------------------------------
    def __call__(self, tstamp, image, depth, intrinsics) -> None:
        """Track one frame (reference __call__, batrack.py:937-1009).

        image: (H, W, 3) uint8/float; depth: (H, W) or (H, W, 1) metric;
        intrinsics: (4,) [fx, fy, cx, cy].
        """
        if (self.n + 1) >= self.dims.N:
            raise RuntimeError(
                f"Buffer size {self.dims.N} exhausted; increase slam.BUFFER_SIZE"
            )

        # ship images as uint8 (the ingest jit converts on device); host->
        # device bandwidth is a first-order cost on tunneled TPUs. Callers
        # may pass already-uploaded jax arrays (see upload_frame) to overlap
        # the transfer with the previous frame's compute.
        if isinstance(image, jax.Array):
            image_np = None
        else:
            image_np = np.asarray(image)
            if image_np.dtype != np.uint8:
                image_np = np.clip(image_np, 0, 255).astype(np.uint8)
            image = jnp.asarray(image_np)
        if not isinstance(depth, jax.Array):
            depth = jnp.asarray(np.asarray(depth), jnp.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        intrinsics = jnp.asarray(np.asarray(intrinsics), jnp.float32)

        if self.visualizer is not None:
            if image_np is None:
                image_np = np.asarray(image)
            self.visualizer.add_frame(image_np)

        self.key, sub = jax.random.split(self.key)
        coords_override = None
        if self.cfg.slam.PATCH_GEN == "sift":
            from batrack_tpu.slam.ingest import generate_patches_sift

            if image_np is None:
                image_np = np.asarray(image)
            coords_override = jnp.asarray(
                generate_patches_sift(
                    image_np, M=self.dims.M, ht=self.dims.ht, wd=self.dims.wd,
                    rng=self._np_rng,
                )
            )
        mark_valid = (self.n % self.cfg.slam.kf_stride == 0) and not self.is_initialized
        will_append = self.n % self.cfg.slam.kf_stride == 0
        ingest_args = (
            image, depth, intrinsics,
            jnp.asarray(self.n, jnp.int32),
            jnp.asarray(self.counter, jnp.int32),
            sub,
        )
        if self.is_initialized and not will_append:
            # steady-state non-append frame: one fused dispatch
            with self.timer.timed("ingest_update", sync=self._state_sync()):
                self.state = self._fused_ingest_update(
                    self.state, *ingest_args,
                    mark_valid=jnp.asarray(mark_valid),
                    coords_override=coords_override,
                )
            self.tlist.append(tstamp)
            self.counter += 1
            self.n += 1
            return

        with self.timer.timed("ingest", sync=self._state_sync()):
            self.state, _ = self._ingest_timed(
                self.state, *ingest_args,
                mark_valid=jnp.asarray(mark_valid),
                coords_override=coords_override,
            )

        self.tlist.append(tstamp)
        self.counter += 1
        self.n += 1

        if (self.n - 1) % self.cfg.slam.kf_stride == 0:
            self._track_append()

        if self.n == self.cfg.slam.num_init + 1 and not self.is_initialized:
            self.is_initialized = True
            for _ in range(12):
                self.update()
        elif self.is_initialized:
            self.update()
            if (
                self.cfg.slam.use_keyframe
                and (self.n - 1) % self.cfg.slam.kf_stride == 0
            ):
                self._keyframe()
            # otherwise edge removal (keyframe_simple) is implicit: the ring
            # overwrite plus the BA patch-window predicate reproduce
            # batrack.py:1020-1024

    # ------------------------------------------------------------------
    @staticmethod
    def upload_frame(image, depth):
        """Start the async host->device transfer of a frame.

        Call one frame ahead of __call__ so the upload overlaps the current
        frame's compute (device_put is asynchronous); pass the returned
        arrays to __call__ in place of the numpy ones.
        """
        image_np = np.asarray(image)
        if image_np.dtype != np.uint8:
            image_np = np.clip(image_np, 0, 255).astype(np.uint8)
        depth_np = np.asarray(depth, np.float32)
        return jax.device_put(image_np), jax.device_put(depth_np)

    def _ingest_timed(self, *args, **kwargs):
        return self._ingest(*args, **kwargs)

    def _state_sync(self):
        """Scalar-fetch sync for honest stage timing (None when disabled)."""
        if not self.sync_stages:
            return None
        return lambda: float(self.state.tstamps[0])

    def _ensure_fused_append(self) -> bool:
        """Build the single-dispatch append jit (input + forward + gate)."""
        if self._fused_append is not None:
            return True
        ad = self.tracker
        if not getattr(ad, "supports_fused_append", False):
            return False  # oracle/custom trackers keep the 3-call path
        dims, slam = self.dims, self.cfg.slam
        build = functools.partial(build_tracker_input, dims=dims)
        gate = functools.partial(
            gate_and_append,
            dims=dims,
            vis_threshold=slam.VIS_THRESHOLD,
            static_threshold=slam.STATIC_THRESHOLD,
            static_quantile=slam.STATIC_QUANTILE,
            min_track_len=slam.MIN_TRACK_LEN,
            boundary_padding=slam.BOUNDARY_PADDING,
        )

        def fused(state, params, n, slot, prev_fmaps, reuse):
            tin = build(state, n)
            tout, fmaps = ad._forward(
                params, tin.window_rgbd, tin.queries, prev_fmaps, reuse
            )
            return gate(state, tin, tout, n, slot), fmaps

        self._fused_append = jax.jit(
            fused, static_argnames=("reuse",), donate_argnums=(0,)
        )
        return True

    def _alloc_slot(self) -> int:
        """Pick the edge-ring slot for this append (see _slot_info).

        A slot is reusable when empty or when all its source frames are
        outside the REMOVAL_WINDOW (its edges are masked out of every BA and
        motionmag already). FIFO among reusable slots keeps the no-keyframe
        path bit-identical to the previous round-robin policy.
        """
        dims, slam = self.dims, self.cfg.slam
        dead_n = self.n - slam.REMOVAL_WINDOW
        best, best_seq = None, None
        for idx, info in enumerate(self._slot_info):
            if info is None:
                seq = -1
            elif all(s < dead_n for s in info["sources"]):
                seq = info["seq"]
            else:
                continue
            if best is None or seq < best_seq:
                best, best_seq = idx, seq
        if best is None:
            # ring over capacity (more in-flight removals than
            # KEYFRAME_RING_EXTRA): overwrite the stalest live slot. Count
            # every occurrence (exported via get_results for visibility) but
            # warn only on the first and each 100th — a long pause would
            # otherwise emit one log line per append
            best = min(
                range(len(self._slot_info)),
                key=lambda i: self._slot_info[i]["seq"],
            )
            self.ring_overflow_count += 1
            if self.ring_overflow_count == 1 or self.ring_overflow_count % 100 == 0:
                import logging

                logging.getLogger(__name__).warning(
                    "edge ring over capacity (%d slots, all live; occurrence "
                    "#%d); overwriting the oldest — raise "
                    "slam.KEYFRAME_RING_EXTRA for exact reference-window "
                    "semantics", dims.ring_slots, self.ring_overflow_count,
                )
        S = min(self.n, dims.S_slam)
        sources = [
            self.n - S + qs * dims.kf_stride
            for qs in range(dims.n_src)
            if qs * dims.kf_stride < S
        ]
        self._slot_info[best] = {"seq": self.append_count, "sources": sources}
        return best

    def _track_append(self) -> None:
        if self.tracker is None:
            raise RuntimeError("no tracker configured")
        # cross-append feature reuse: consecutive appends on a full window
        # share all but `shift` frames (encode only the new ones)
        shift = None
        if (
            self._last_append_n is not None
            and self._last_append_n >= self.dims.S_slam
            and 0 < self.n - self._last_append_n < self.dims.S_slam
        ):
            shift = self.n - self._last_append_n
        if hasattr(self.tracker, "reuse_hint"):
            self.tracker.reuse_hint = shift
        slot = self._alloc_slot()
        sync_on = self.sync_stages
        if self._ensure_fused_append():
            ad = self.tracker
            if ad.params is None:
                ad.init_params(
                    self._build_input(self.state, jnp.asarray(self.n, jnp.int32))
                )
            reuse = shift or 0
            prev = ad._fmap_cache if reuse else None
            if prev is None:
                reuse = 0
            with self.timer.timed("append", sync=self._state_sync()):
                self.state, fmaps = self._fused_append(
                    self.state, ad.params,
                    jnp.asarray(self.n, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                    prev, reuse=reuse,
                )
            ad._fmap_cache = fmaps
        else:
            with self.timer.timed(
                "build_input",
                sync=(lambda: float(tin.queries[0, 0])) if sync_on else None,
            ):
                tin = self._build_input(self.state, jnp.asarray(self.n, jnp.int32))
            with self.timer.timed(
                "tracker",
                sync=(lambda: float(tout.tracks[0, 0, 0])) if sync_on else None,
            ):
                tout = self.tracker(tin)
            with self.timer.timed("gate_append", sync=self._state_sync()):
                self.state = self._gate_append(
                    self.state,
                    tin,
                    tout,
                    jnp.asarray(self.n, jnp.int32),
                    jnp.asarray(slot, jnp.int32),
                )
        self.append_count += 1
        self._last_append_n = self.n
        if self.visualizer is not None:
            # lazily-converted vis payload (slam_visualizer add_track feed,
            # batrack.py:807-818)
            eps = self.dims.edges_per_slot
            rows = slice(slot * eps, (slot + 1) * eps)
            S, NS, M = self.dims.S_slam, self.dims.n_src, self.dims.M
            tgt = np.asarray(self.state.e_target[rows]).reshape(NS, M, S, 3)
            w = np.asarray(self.state.e_weight[rows, 0]).reshape(NS, M, S)
            st = np.asarray(self.state.e_static[rows]).reshape(NS, M, S)
            self.visualizer.add_track({
                "fid": self.n,
                "targets": np.moveaxis(tgt[..., :2], 2, 0).reshape(S, NS * M, 2),
                "weights": np.moveaxis(w, 2, 0).reshape(S, NS * M),
                # static(green)/dynamic(red) split, the reference demo's
                # signature rendering (slam_visualizer.py:165-188)
                "static": np.moveaxis(st, 2, 0).reshape(S, NS * M),
            })

    def update(self) -> None:
        with self.timer.timed("ba_update", sync=self._state_sync()):
            self.state = self._update_timed()

    def _update_timed(self):
        return self._update(
            self.state,
            jnp.asarray(self.n, jnp.int32),
            jnp.asarray(self.is_initialized),
        )

    def _keyframe(self) -> None:
        """Motion-magnitude keyframe removal (batrack.py:1026-1073)."""
        slam = self.cfg.slam
        k = self.n - slam.KEYFRAME_INDEX
        if k % slam.kf_stride != 0 or k < 1:
            return
        i = self.n - slam.KEYFRAME_INDEX - 1
        j = self.n - slam.KEYFRAME_INDEX + 1
        mag = float(self._motionmag_pair(
            self.state, jnp.asarray(i), jnp.asarray(j), jnp.asarray(k)
        ))
        if mag < slam.KEYFRAME_THRESH:
            t0 = int(self.state.tstamps[k - 1])
            t1 = int(self.state.tstamps[k])
            dP = np.asarray(
                se3.mul(self.state.poses[k], se3.inv(self.state.poses[k - 1]))
            )
            self.delta[t1] = (t0, dP)
            self.state = self._remove_kf(
                self.state, jnp.asarray(k, jnp.int32), jnp.asarray(self.n, jnp.int32)
            )
            win_idx = k - self.n + self.dims.S_slam
            if 0 <= win_idx < self.dims.S_slam:
                self.state = self._remove_win(self.state, jnp.asarray(win_idx))
            self.n -= 1
            self._last_append_n = None  # window contents changed; drop cache
            # mirror the buffer shift in the slot source bookkeeping: frame k
            # is gone (its edges got e_valid=0), frames above slide down
            for info in self._slot_info:
                if info is not None:
                    info["sources"] = [
                        s - (s > k) for s in info["sources"] if s != k
                    ]

    # ------------------------------------------------------------------
    def world_trajectories(self) -> "jnp.ndarray":
        """Static+dynamic world-point trajectories (the reference's
        trajs_3d_world_ buffer, batrack.py:87).

        Computed lazily with one full write_world pass: the per-frame loop
        skips trajs_world maintenance (no consumer reads it mid-sequence,
        and rows freeze once outside the window, so this pass reproduces
        incremental maintenance exactly — tested in test_slam_e2e)."""
        from batrack_tpu.slam.update import update_point_cloud

        state = update_point_cloud(
            self.state, jnp.asarray(self.n, jnp.int32), self.dims,
            window_frames=None, write_world=True,
        )
        self.state = self.state._replace(trajs_world=state.trajs_world)
        return self.state.trajs_world

    # ------------------------------------------------------------------
    def save_state(self, path: str) -> None:
        """Checkpoint the full SLAM state for mid-sequence resume."""
        from batrack_tpu.slam.checkpoint import save_slam_state

        save_slam_state(self, path)

    def load_state(self, path: str) -> None:
        from batrack_tpu.slam.checkpoint import load_slam_state

        load_slam_state(self, path)
        self._last_append_n = None

    # ------------------------------------------------------------------
    def get_pose(self, t: int, traj: Dict[int, np.ndarray]) -> np.ndarray:
        """Pose for counter t, following removal deltas (batrack.py:223-228)."""
        if t in traj:
            return traj[t]
        t0, dP = self.delta[t]
        return np.asarray(se3.mul(jnp.asarray(dP), jnp.asarray(self.get_pose(t0, traj))))

    def _full_traj(self) -> np.ndarray:
        tstamps = np.asarray(self.state.tstamps[: self.n])
        poses = np.asarray(self.state.poses[: self.n])
        traj = {int(t): poses[i] for i, t in enumerate(tstamps)}
        return np.stack([self.get_pose(t, traj) for t in range(self.counter)])

    def terminate(self) -> Tuple[np.ndarray, np.ndarray]:
        """Final camera-to-world TUM trajectory (batrack.py:898-915).

        Returns (poses (C, 7) [tx ty tz qw qx qy qz], tstamps (C,)).
        """
        poses = self._full_traj()
        poses = np.asarray(se3.inv(jnp.asarray(poses)))  # w2c -> c2w
        poses = poses[:, [0, 1, 2, 6, 3, 4, 5]]
        tstamps = np.asarray(self.tlist, dtype=float)
        return poses, tstamps

    # ------------------------------------------------------------------
    def get_results(
        self,
        rgbs=None,
        dmaps=None,
        dmaps_gt=None,
        save_path: Optional[str] = None,
    ) -> dict:
        """Results dict with the reference pickle schema (batrack.py:1080-1135)
        so the dense-refinement stage and visualizers interoperate.

        Reference-faithful caveat: per-frame/per-patch buffers are sliced by
        global counter C while being positioned by buffer index — under
        use_keyframe removal (n < counter) rows beyond n are stale and rows
        are offset from cams_T_world, exactly as in the reference
        (batrack.py:1091-1103 slices the same buffers by self.counter).
        use_keyframe is disabled in every shipped config, reference and
        here alike — but unlike the reference, when removals DID happen this
        export warns loudly and records which rows are affected
        (``stale_rows``: buffer row i whose content belongs to a frame
        != i, or beyond the live buffer) plus ``buffer_tstamps`` (the frame
        id each live row actually holds) so a consumer can remap instead of
        silently reading garbage."""
        C = self.counter
        M, S_local = self.dims.M, self.dims.S_local
        # under keyframe removal the counter can exceed the buffer capacity
        # (removals stall n while C grows); the buffers hold at most N rows,
        # so the per-frame exports truncate there instead of crashing on the
        # reshape (the reference crashes outright in this regime) — every
        # truncated/absent row is flagged via stale_rows below
        Cr = min(C, self.dims.N)

        poses = self._full_traj()
        import batrack_tpu.geometry.se3 as se3m

        cams_T_world = np.asarray(se3m.matrix(se3m.inv(jnp.asarray(poses))))

        state = self.state
        pts_valid = np.asarray(state.patches_valid[: Cr * M]).reshape(Cr, M)
        trajs_weights = np.asarray(state.local_weights[: Cr * M]).reshape(Cr, M, S_local)
        results = {
            "cams_T_world": cams_T_world,
            "intrinsics": np.asarray(state.intrinsics[:Cr]),
            "tstamps": np.asarray(self.tlist, dtype=float),
            "trajs_2d_disp": np.asarray(state.local_targets[: Cr * M]).reshape(
                Cr, M, S_local, 3
            ),
            "trajs_valid": (trajs_weights.sum(axis=2) > 0),
            "trajs_static": np.asarray(state.local_static[: Cr * M]).reshape(
                Cr, M, S_local
            ),
            "trajs_vis": np.asarray(state.local_vis[: Cr * M]).reshape(Cr, M, S_local),
            "grid_query_frames": np.arange(Cr)[pts_valid.sum(axis=1) > 0],
            "dmaps": None if dmaps is None else np.asarray(dmaps, dtype=float),
            "rgbs": None if rgbs is None else np.asarray(rgbs, dtype=float),
            "dmaps_gt": None if dmaps_gt is None else np.asarray(dmaps_gt, dtype=float),
        }
        if self.ring_overflow_count:
            results["ring_overflow_count"] = int(self.ring_overflow_count)
        if self.delta:
            # keyframe removals happened: per-frame rows are buffer-indexed
            # while cams_T_world is counter-indexed (see docstring). Rows in
            # [n, Cr) hold stale buffer content; counters beyond Cr (buffer
            # capacity) have no row at all
            buffer_tstamps = np.asarray(self.state.tstamps[: self.n])
            misaligned = np.nonzero(buffer_tstamps != np.arange(self.n))[0]
            stale = np.concatenate([misaligned, np.arange(self.n, Cr)])
            results["stale_rows"] = stale.astype(np.int64)
            results["buffer_tstamps"] = buffer_tstamps.astype(np.int64)
            import logging

            logging.getLogger(__name__).warning(
                "get_results after %d keyframe removal(s): %d of %d per-frame "
                "rows in trajs_*/dmaps-aligned buffers are stale or "
                "misaligned with cams_T_world (reference-identical layout, "
                "batrack.py:1091-1103)%s. Consumers must remap via the "
                "'stale_rows'/'buffer_tstamps' fields or disable "
                "slam.use_keyframe.", len(self.delta), len(stale), Cr,
                "" if Cr == C else
                f"; counters {Cr}..{C - 1} exceed the buffer capacity and "
                "have no per-frame rows (truncated export)",
            )
        if save_path is not None:
            import pickle

            with open(save_path, "wb") as f:
                pickle.dump(results, f)
        return results
