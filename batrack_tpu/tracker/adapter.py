"""SLAM adapter: wraps the Flax MDTracker as a `TrackerFn`.

Handles what _compute_sparse_tracks does around the network
(batrack.py:529-587): resize the RGB-D window to the model resolution,
scale query coordinates in, scale track outputs back out. The query-point
overwrite happens in the SLAM frontend (slam/frontend.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from batrack_tpu.ops.sampling import interpolate_bilinear
from batrack_tpu.slam.frontend import TrackerInput, TrackerOutput
from batrack_tpu.tracker.mdtracker import MDTracker, TrackerParams
from batrack_tpu.utils.config import ModelConfig


class MDTrackerAdapter:
    """Jit-compiled tracker callable for the SLAM system."""

    # the SLAM system may trace self._forward inside its single-dispatch
    # append jit (build input + forward + gate) instead of calling __call__
    supports_fused_append = True

    def __init__(
        self,
        model_cfg: ModelConfig,
        params: Optional[dict] = None,
        seed: int = 0,
        dtype=None,
        backward_tracking: bool = False,
        static_threshold: float = 0.1,
        mesh=None,
        pallas_interpret: bool = False,
    ):
        """mesh: optional jax.sharding.Mesh — shards the query/track axis
        over the full mesh. The Pallas corr/attention kernels stay ON under
        a mesh via explicit shard_map over the track axis
        (parallel/shard_kernels.py): per-track corr/flow/time-attention
        need no communication; space attention all-gathers the packed
        key/value rows. None = single device.

        pallas_interpret: run the Pallas kernels in interpret mode on
        non-TPU backends (tests and the CPU-mesh dryrun exercise the real
        kernel code paths; no-op on TPU)."""
        import jax as _jax

        self.p = TrackerParams.from_config(model_cfg)
        if dtype is None:
            dtype = jnp.dtype(model_cfg.compute_dtype)
        on_tpu = _jax.default_backend() not in ("cpu", "gpu")
        if pallas_interpret and not on_tpu:
            self.p = self.p._replace(pallas_interpret=True)
        if model_cfg.use_pallas_corr and not on_tpu and not self.p.pallas_interpret:
            # the fused kernel is TPU-only; fall back to the XLA path
            self.p = self.p._replace(use_pallas_corr=False)
        self.mesh = mesh
        self.model = MDTracker(self.p, dtype=dtype, mesh=mesh)
        self.backward_tracking = backward_tracking
        # static-branch output merge (batrack.py:556-566): use_static_mask
        # swaps in the static-branch track where the dynamic prob is high;
        # use_static replaces everything with the static branch
        self.use_static_mask = model_cfg.use_static_mask
        self.use_static = model_cfg.use_static
        self.static_threshold = static_threshold
        # backward-tracking pass: the merge consumes only traj/depth/vis/dyn,
        # all of which come from the total branch, so the static-branch
        # refinement (static_iters x updateformer_dyn) is dead compute there
        # — unless the static merge is enabled, which reads istatic3d
        if self.use_static_mask or self.use_static:
            self.model_bwd = self.model
        else:
            self.model_bwd = MDTracker(
                self.p._replace(static_iters=0), dtype=dtype, mesh=mesh
            )
        self.params = params  # {'params': ...}; random-init lazily if None
        self._seed = seed
        self._apply = jax.jit(self._forward, static_argnames=("reuse",))
        # cross-append feature-map cache: the SLAM system sets reuse_hint to
        # the window shift (kf_stride) when consecutive appends share frames
        self.reuse_hint: Optional[int] = None
        self._fmap_cache = None

    def init_params(self, sample: TrackerInput):
        window, queries = self._prepare(sample.window_rgbd, sample.queries)
        # jit the initializer: op-by-op init is minutes of dispatch latency
        self.params = jax.jit(self.model.init)(
            jax.random.PRNGKey(self._seed), window, queries
        )

    def _prepare(self, window_rgbd, queries):
        ih, iw = self.p.interp_shape
        S, _, H, W = window_rgbd.shape
        window = interpolate_bilinear(window_rgbd, (ih, iw))  # (S, 4, ih, iw)
        q = queries.at[:, 1].mul(iw / W).at[:, 2].mul(ih / H)
        return window, q

    def _static_merge(self, traj, depth, static3d, dyn):
        """Static-branch merge (batrack.py:556-566, 600-609), model-resolution
        coordinates; applied to forward and backward passes alike."""
        if self.use_static_mask:
            dyn_mask = dyn > (1.0 - self.static_threshold)
            traj = jnp.where(dyn_mask[..., None], static3d[..., :2], traj)
            depth = jnp.where(dyn_mask, static3d[..., 2], depth)
        if self.use_static:
            traj = static3d[..., :2]
            depth = static3d[..., 2]
        return traj, depth

    def _shard_tracks(self, x, axis_pos):
        """Sharding constraint on the track axis (no-op without a mesh)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        names = tuple(self.mesh.axis_names)
        axis = names if len(names) > 1 else names[0]
        spec = [None] * x.ndim
        spec[axis_pos] = axis
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, P(*spec))
        )

    def _forward(self, params, window_rgbd, queries, prev_fmaps=None, reuse=0):
        ih, iw = self.p.interp_shape
        S, _, H, W = window_rgbd.shape
        window, q = self._prepare(window_rgbd, queries)
        q = self._shard_tracks(q, 0)
        traj, depth, static3d, vis, dyn, fmaps = self.model.apply(
            params, window, q, prev_fmaps, reuse
        )
        traj = self._shard_tracks(traj, 1)
        depth = self._shard_tracks(depth, 1)
        traj, depth = self._static_merge(traj, depth, static3d, dyn)

        scale = jnp.asarray([W / iw, H / ih], jnp.float32)
        tracks = traj * scale[None, None, :]

        if self.backward_tracking:
            # flip the window, flip query times, fill never-seen slots
            # (_compute_backward_tracks, batrack.py:590-629). The backward
            # pass re-encodes its own features: backward tracking only runs
            # in multi-window configs (S_slam > model.S), where the forward
            # fmaps were encoded under per-window sliding depth-normalisation
            # stats — reusing them reversed diverges from a fresh backward
            # encode by ~0.3 px (measured), amplified by the iterative
            # refinement.
            inv_window = window[::-1]
            inv_q = q.at[:, 0].set(S - 1 - q[:, 0])
            itraj, idepth, istatic3d, ivis, idyn, _ = self.model_bwd.apply(
                params, inv_window, inv_q
            )
            itraj, idepth = self._static_merge(itraj, idepth, istatic3d, idyn)
            itraj = itraj[::-1]
            idepth = idepth[::-1]
            ivis = ivis[::-1]
            idyn = idyn[::-1]
            mask = tracks == 0.0
            tracks = jnp.where(mask, itraj * scale[None, None, :], tracks)
            m0 = mask[..., 0]
            depth = jnp.where(m0, idepth, depth)
            vis = jnp.where(m0, ivis, vis)
            dyn = jnp.where(m0, idyn, dyn)

        return TrackerOutput(tracks=tracks, depths=depth, vis=vis, dynamic=dyn), fmaps

    def __call__(self, tin: TrackerInput) -> TrackerOutput:
        if self.params is None:
            self.init_params(tin)
        reuse = self.reuse_hint or 0
        prev = self._fmap_cache if reuse else None
        if prev is None:
            reuse = 0
        out, fmaps = self._apply(
            self.params, tin.window_rgbd, tin.queries, prev, reuse=reuse
        )
        self._fmap_cache = fmaps
        return out
